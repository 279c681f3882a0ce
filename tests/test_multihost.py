"""2-process CPU multi-host smoke test (VERDICT r1 #7).

Launches two OS processes that form a jax.distributed world (coordinator
on localhost, 2 virtual CPU devices each → a 4-device global mesh), run 3
data-parallel train steps through the same launch/shard path train.py
uses, and checks both ranks converge to the SAME loss as a single-process
run over the identical global batches.
"""
import os
import os.path as osp
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

import conftest  # noqa: F401  (forces CPU in this process)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_matches_single_process(tmp_path):
    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    worker = osp.join(repo, "tests", "_multihost_worker.py")
    port = _free_port()

    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update({
            "ONEPOSE_COORDINATOR": f"127.0.0.1:{port}",
            "ONEPOSE_NUM_PROCESSES": "2",
            "ONEPOSE_PROCESS_ID": str(rank),
            "JAX_PLATFORMS": "cpu",
        })
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"rank failed:\n{out}\n{err}"
        outs.append(out)

    losses = []
    for out in outs:
        m = re.search(r"FINAL_LOSS ([0-9.eE+-]+)", out)
        assert m, out
        losses.append(float(m.group(1)))
    assert np.isfinite(losses).all()
    # replicated state → both ranks report the identical loss
    assert abs(losses[0] - losses[1]) < 1e-7, losses

    # single-process reference over the same global batches (4-device mesh
    # inside this test process's virtual 8-CPU environment)
    import jax

    from onepose_tpu.parallel import mesh as pmesh
    from onepose_tpu.train import trainer

    mesh = pmesh.make_mesh(4)
    cfg = {"num_blocks": 1}
    tx = trainer.make_optimizer(base_lr=1e-3, milestones_steps=[100],
                                grad_clip=0.5)
    state = trainer.init_train_state(jax.random.PRNGKey(0), tx, cfg)
    state = pmesh.replicate(mesh, state)
    step = trainer.make_train_step(tx, cfg)
    n1, n2, leaf, d = 16, 8, 2, 256
    loss = None
    for i in range(3):
        rng = np.random.default_rng(100 + i)
        batch = {
            "descriptors2d_query": rng.normal(
                size=(4, n1, d)).astype(np.float32),
            "descriptors3d_db": rng.normal(
                size=(4, n2, d)).astype(np.float32),
            "descriptors2d_db": rng.normal(
                size=(4, n2 * leaf, d)).astype(np.float32),
            "conf_gt": (rng.uniform(size=(4, n1, n2)) < 0.05
                        ).astype(np.int32),
        }
        state, loss = step(state, pmesh.shard_batch(mesh, batch))
    ref = float(np.asarray(loss))
    assert abs(ref - losses[0]) < 1e-5, (ref, losses)
