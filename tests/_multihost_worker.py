"""Worker for the 2-process CPU multi-host smoke test.

Run with ONEPOSE_COORDINATOR / ONEPOSE_NUM_PROCESSES / ONEPOSE_PROCESS_ID
set. Each process provisions 2 virtual CPU devices (global world = 4
devices over 2 processes), initializes jax.distributed through the same
launch path train.py uses, runs 3 deterministic data-parallel train steps
feeding its local slice of the global batch, and prints the final loss.
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


def main():
    assert launch.maybe_initialize(None), "coordinator env not set?"
    world = jax.process_count()
    rank = comm.get_rank()
    assert world == 2, world
    assert len(jax.devices()) == 4, jax.devices()

    mesh = pmesh.make_mesh()
    cfg = {"num_blocks": 1}
    tx = trainer.make_optimizer(base_lr=1e-3, milestones_steps=[100],
                                grad_clip=0.5)
    state = trainer.init_train_state(jax.random.PRNGKey(0), tx, cfg)
    state = pmesh.replicate(mesh, state)
    step = trainer.make_train_step(tx, cfg)

    global_bs = 4
    local_bs = global_bs // world
    lo, hi = rank * local_bs, (rank + 1) * local_bs
    n1, n2, leaf, d = 16, 8, 2, 256

    loss = None
    for i in range(3):
        rng = np.random.default_rng(100 + i)  # same on every process
        batch = {
            "descriptors2d_query": rng.normal(
                size=(global_bs, n1, d)).astype(np.float32),
            "descriptors3d_db": rng.normal(
                size=(global_bs, n2, d)).astype(np.float32),
            "descriptors2d_db": rng.normal(
                size=(global_bs, n2 * leaf, d)).astype(np.float32),
            "conf_gt": (rng.uniform(size=(global_bs, n1, n2)) < 0.05
                        ).astype(np.int32),
        }
        local = {k: v[lo:hi] for k, v in batch.items()}
        sharded = pmesh.shard_batch(mesh, local)
        state, loss = step(state, sharded)

    final = float(np.asarray(loss))
    comm.synchronize()
    print(f"RANK{rank} FINAL_LOSS {final:.8f}", flush=True)


if __name__ == "__main__":
    main()
