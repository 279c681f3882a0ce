"""Worker for the multi-process CPU serving test.

Run with ONEPOSE_COORDINATOR / ONEPOSE_NUM_PROCESSES / ONEPOSE_PROCESS_ID
set. Each process provisions 2 virtual CPU devices (global world = 4
devices), builds the IDENTICAL tiny catalog, forms a global
("data", "model") = (2, 2) mesh, and enters the collective serve loop.
Process 0 feeds deterministic mixed-object batches and writes the
results to ONEPOSE_MHS_OUT (.npz) for the test to compare against a
single-process mesh server over the same requests.
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

from onepose_tpu.parallel import launch, serve_launch  # noqa: E402
from onepose_tpu.parallel import mesh as pmesh  # noqa: E402
from onepose_tpu.serving import PoseRequest  # noqa: E402

H = W = 64
N_BATCHES = 3
BATCH = 4
NAMES = ["objA", "objB", "objC"]


def build_catalog():
    """Deterministic catalog + params (identical on every process)."""
    from onepose_tpu.datasets import anno
    from onepose_tpu.models import gats_spg, superpoint

    rng = np.random.default_rng(7)

    def make_db():
        shape3d, leaf = 48, 2
        P = shape3d - 4
        idxs = rng.integers(2, 6, P)
        total = int(idxs.sum())
        return anno.build_object_db(
            avg_keypoints3d=rng.uniform(
                -0.1, 0.1, (P, 3)).astype(np.float32),
            avg_descriptors3d=rng.normal(size=(256, P)).astype(np.float32),
            avg_scores3d=rng.uniform(0, 1, (P, 1)).astype(np.float32),
            clt_descriptors=rng.normal(
                size=(256, total)).astype(np.float32),
            clt_scores=rng.uniform(0, 1, (total, 1)).astype(np.float32),
            idxs=idxs, num_leaf=leaf, shape3d=shape3d)

    key = jax.random.PRNGKey(3)
    sp_params = superpoint.init_params(key)
    gats_params = gats_spg.init_params(key)
    dbs = {n: make_db() for n in NAMES}
    return sp_params, gats_params, dbs


def make_requests(b):
    """Deterministic mixed-object batch b."""
    rng = np.random.default_rng(500 + b)
    K = np.array([[460.0, 0, W / 2], [0, 460.0, H / 2], [0, 0, 1]],
                 np.float32)
    return [
        PoseRequest(NAMES[(b + i) % len(NAMES)],
                    rng.uniform(0, 1, (H, W)).astype(np.float32), K)
        for i in range(BATCH)
    ]


def make_server(cls, mesh, **kw):
    sp_params, gats_params, dbs = build_catalog()
    return cls(sp_params, gats_params, dbs,
               sp_config={"max_keypoints": 64}, batch_size=BATCH,
               num_hypotheses=32, refine_iters=2, seed=11, mesh=mesh,
               **kw)


def main():
    assert launch.maybe_initialize(None), "coordinator env not set?"
    rank = jax.process_index()
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4, jax.devices()

    mesh = pmesh.make_mesh(4, axis_shapes=(2, 2))
    server = make_server(serve_launch.MultiHostPoseServer, mesh)

    batches = iter(range(N_BATCHES))
    collected = []

    def next_batch():
        b = next(batches, None)
        return None if b is None else make_requests(b)

    served = serve_launch.serve_forever(
        server, (H, W),
        next_batch=next_batch if rank == 0 else None,
        deliver=collected.append if rank == 0 else None)
    assert served == N_BATCHES, served

    if rank == 0:
        poses = np.stack([
            [r["pose"] if r["pose"] is not None else np.full((3, 4), np.nan)
             for r in batch] for batch in collected])
        success = np.asarray([[r["success"] for r in batch]
                              for batch in collected])
        inliers = np.asarray([[r["num_inliers"] for r in batch]
                              for batch in collected])
        np.savez(os.environ["ONEPOSE_MHS_OUT"],
                 poses=poses, success=success, inliers=inliers)
        print("RANK0 WROTE RESULTS", flush=True)
    print(f"RANK{rank} DONE", flush=True)


if __name__ == "__main__":
    main()
