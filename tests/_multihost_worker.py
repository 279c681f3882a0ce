"""Worker for the multi-process CPU multi-host training tests.

Run with ONEPOSE_COORDINATOR / ONEPOSE_NUM_PROCESSES / ONEPOSE_PROCESS_ID
set. Each process provisions 2 virtual CPU devices (global world = 2 x 2 =
4 devices), initializes jax.distributed through the same launch path
train.py uses, runs deterministic data-parallel train steps feeding its
local slice of the global batch, and prints per-step losses.

Extra env knobs (test-driven):
- ONEPOSE_MH_STEPS:      total steps (default 3)
- ONEPOSE_MH_PROTOCOL=1: protocol shapes (shape2d=1000, shape3d=2000,
                         num_leaf=8, global batch 8) instead of tiny
- ONEPOSE_MH_CKPT:       dir; rank 0 saves a checkpoint after
                         ONEPOSE_MH_CKPT_STEP steps
- ONEPOSE_MH_RESUME:     checkpoint path; restore it and continue from
                         its recorded step (fresh processes — proves
                         cross-process checkpoint/resume)
"""
import os
import os.path as osp
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "xla_force_host_platform_device_count" not in f]
_flags.append("--xla_force_host_platform_device_count=2")
os.environ["XLA_FLAGS"] = " ".join(_flags)

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from onepose_tpu.parallel import collectives as comm  # noqa: E402
from onepose_tpu.parallel import launch, mesh as pmesh  # noqa: E402
from onepose_tpu.train import trainer  # noqa: E402
from onepose_tpu.utils import model_io  # noqa: E402


def make_batch(i, global_bs, n1, n2, leaf, d):
    """Deterministic global batch for step i (same on every process)."""
    rng = np.random.default_rng(100 + i)
    return {
        "descriptors2d_query": rng.normal(
            size=(global_bs, n1, d)).astype(np.float32),
        "descriptors3d_db": rng.normal(
            size=(global_bs, n2, d)).astype(np.float32),
        "descriptors2d_db": rng.normal(
            size=(global_bs, n2 * leaf, d)).astype(np.float32),
        "conf_gt": (rng.uniform(size=(global_bs, n1, n2)) < 0.05
                    ).astype(np.int32),
    }


def main():
    assert launch.maybe_initialize(None), "coordinator env not set?"
    world = jax.process_count()
    rank = comm.get_rank()
    assert world == 2, world
    assert len(jax.devices()) == 4, jax.devices()

    steps = int(os.environ.get("ONEPOSE_MH_STEPS", "3"))
    protocol = os.environ.get("ONEPOSE_MH_PROTOCOL", "0") == "1"
    ckpt_dir = os.environ.get("ONEPOSE_MH_CKPT", "")
    ckpt_step = int(os.environ.get("ONEPOSE_MH_CKPT_STEP", "-1"))
    resume = os.environ.get("ONEPOSE_MH_RESUME", "")

    if protocol:
        # protocol token budgets (train_GATsSPG.yaml:76-79); num_blocks=1
        # and global batch 4 keep 50 steps affordable on the 1-CPU CI box
        # — the sharding layout over the token axes, not GNN depth or
        # batch, is what multi-process equality exercises
        global_bs, n1, n2, leaf, d = 4, 1000, 2000, 8, 256
    else:
        global_bs, n1, n2, leaf, d = 4, 16, 8, 2, 256

    mesh = pmesh.make_mesh()
    cfg = {"num_blocks": 1}
    tx = trainer.make_optimizer(base_lr=1e-3, milestones_steps=[100],
                                grad_clip=0.5)
    state = trainer.init_train_state(jax.random.PRNGKey(0), tx, cfg)

    start_step = 0
    if resume:
        restored = model_io.load_pytree(
            resume, {"params": state.params, "opt_state": state.opt_state,
                     "step": state.step})
        # orbax returns device-committed arrays; replicate() would then
        # need a cross-host transfer (unsupported on this backend). Host
        # numpy leaves are placement-free.
        restored = jax.tree.map(np.asarray, restored)
        state = trainer.TrainState(
            restored["params"], restored["opt_state"], restored["step"])
        start_step = int(np.asarray(restored["step"]))
        print(f"RANK{rank} RESUMED {start_step}", flush=True)

    state = pmesh.replicate(mesh, state)
    step = trainer.make_train_step(tx, cfg)

    local_bs = global_bs // world
    lo, hi = rank * local_bs, (rank + 1) * local_bs

    loss = None
    for i in range(start_step, steps):
        batch = make_batch(i, global_bs, n1, n2, leaf, d)
        local = {k: v[lo:hi] for k, v in batch.items()}
        state, loss = step(state, pmesh.shard_batch(mesh, local))
        print(f"RANK{rank} STEP {i} LOSS {float(np.asarray(loss)):.8f}",
              flush=True)
        if ckpt_dir and i + 1 == ckpt_step:
            # EVERY process calls save: orbax's checkpointer runs global
            # barriers internally (sync_global_processes) and elects the
            # writer itself — a rank-0-only call deadlocks/crashes on the
            # barrier name mismatch.
            model_io.save_train_state(
                jax.tree.map(np.asarray, state),
                osp.join(ckpt_dir, f"step={i + 1}"))
            if rank == 0:
                print(f"RANK0 SAVED step={i + 1}", flush=True)

    final = float(np.asarray(loss))
    comm.synchronize()
    print(f"RANK{rank} FINAL_LOSS {final:.8f}", flush=True)


if __name__ == "__main__":
    main()
