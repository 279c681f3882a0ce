#!/usr/bin/env python
"""Benchmark: fused frame→pose throughput on one TPU chip.

Protocol shapes match the reference eval pipeline (512x512 GT-box crops,
max_keypoints=1024, shape3d=2000, num_leaf=8, RANSAC 5px — see
/root/reference/configs/experiment/test_GATsSPG.yaml and BASELINE.md).

Baseline denominator: the reference torch-CPU frame→pose path (SuperPoint →
GATsSPG → cv2.solvePnPRansac) measured at the same shapes on this image's
8-thread CPU: 0.625 frames/sec (see BASELINE.md "Measured baseline").

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np

REF_CPU_FPS = 0.625  # measured reference baseline (BASELINE.md)

BATCH = 8
H = W = 512
MAX_KPTS = 1024
SHAPE3D = 2000
NUM_LEAF = 8
NUM_HYPOTHESES = 512


def main():
    import jax

    from onepose_tpu import pipeline
    from onepose_tpu.datasets import anno
    from onepose_tpu.models import gats_spg, superpoint

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    sp_params = superpoint.init_params(key)
    gats_params = gats_spg.init_params(key)

    P = SHAPE3D - 8  # a few padded slots, like a real object DB
    idxs = rng.integers(NUM_LEAF, NUM_LEAF * 3, P)
    total = int(idxs.sum())
    db = anno.build_object_db(
        avg_keypoints3d=rng.uniform(-0.1, 0.1, (P, 3)).astype(np.float32),
        avg_descriptors3d=rng.normal(size=(256, P)).astype(np.float32),
        avg_scores3d=rng.uniform(0, 1, (P, 1)).astype(np.float32),
        clt_descriptors=rng.normal(size=(256, total)).astype(np.float32),
        clt_scores=rng.uniform(0, 1, (total, 1)).astype(np.float32),
        idxs=idxs, num_leaf=NUM_LEAF, shape3d=SHAPE3D,
    )

    pipe = pipeline.PosePipeline(
        sp_params, gats_params, db,
        sp_config={"max_keypoints": MAX_KPTS},
        num_hypotheses=NUM_HYPOTHESES)

    images = jax.device_put(
        rng.uniform(0, 1, (BATCH, H, W, 1)).astype(np.float32))
    Ks = jax.device_put(np.broadcast_to(
        np.array([[460.0, 0, W / 2], [0, 460.0, H / 2], [0, 0, 1]],
                 np.float32), (BATCH, 3, 3)).copy())
    keys = jax.random.split(jax.random.PRNGKey(1), BATCH)

    # Warmup / compile. NOTE: on the tunneled TPU backend
    # jax.block_until_ready returns before execution completes, so timing
    # forces completion with a host fetch (np.asarray). Every host fetch
    # costs a ~29 ms HTTP round trip on this tunnel, so the steady-state
    # measurement chains iterations through a scalar data dependency and
    # fetches ONE scalar per block — measuring device throughput (the
    # deployment-relevant number on directly-attached hardware) rather
    # than tunnel latency. The first chained block is a throwaway: it
    # absorbs a hidden first-execution/autotuning cost that can reach
    # seconds on this backend.
    import jax.numpy as jnp

    out = pipe(images, Ks, keys)
    np.asarray(out.poses)

    n_iters, n_blocks = 20, 4
    fps_samples = []
    for blk in range(n_blocks):
        t0 = time.perf_counter()
        eps = jnp.float32(0.0)
        for _ in range(n_iters):
            out = pipe(images + eps * 0, Ks, keys)
            eps = jnp.sum(out.poses)
        np.asarray(eps)
        dt = time.perf_counter() - t0
        if blk > 0:
            fps_samples.append(BATCH * n_iters / dt)
    fps = float(np.median(fps_samples))
    print(json.dumps({
        "metric": "frames_per_sec_per_chip_frame_to_pose",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REF_CPU_FPS, 2),
    }))


if __name__ == "__main__":
    main()
