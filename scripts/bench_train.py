#!/usr/bin/env python
"""End-to-end training throughput at protocol shapes on one chip.

Builds a synthetic protocol-scale dataset on disk once (1 object, 2000
3D points, ~45k stacked observations, 96 images with sidecar caches
pre-written), then measures epoch items/s for the device-resident input
paths and the step-only ceiling. See docs/DESIGN.md §12.

    python scripts/bench_train.py [--root /tmp/onepose_train_bench]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D, P, NIMG, N2D = 256, 2000, 96, 600
B, S2, S3, L = 8, 1000, 2000, 8


def build_dataset(root: str):
    os.makedirs(f"{root}/anno", exist_ok=True)
    rng = np.random.default_rng(0)
    idxs = rng.integers(8, 40, P).astype(np.int64)
    total = int(idxs.sum())
    np.save(f"{root}/idxs.npy", idxs)
    np.savez(f"{root}/anno_3d_collect.npz",
             keypoints3d=rng.uniform(-.1, .1, (P, 3)).astype(np.float32),
             descriptors3d=rng.standard_normal((D, total)).astype(np.float32),
             scores3d=rng.uniform(0, 1, (total, 1)).astype(np.float32))
    np.savez(f"{root}/anno_3d_average.npz",
             descriptors3d=rng.standard_normal((D, P)).astype(np.float32),
             scores3d=rng.uniform(0, 1, (P, 1)).astype(np.float32))
    images, annos = [], []
    for i in range(NIMG):
        ap = f"{root}/anno/{i}.json"
        with open(ap, "w") as f:
            json.dump({"synthetic": True}, f)
        # write the binary sidecar the dataset's JSON parse would have
        # produced — steady-state epochs read only the cache
        np.savez(f"{ap}.cache.npz",
                 keypoints2d=rng.uniform(0, 511, (N2D, 2)).astype(np.float32),
                 descriptors2d=rng.standard_normal(
                     (N2D, D)).astype(np.float32),
                 scores2d=rng.uniform(0, 1, N2D).astype(np.float32),
                 assign_matrix=np.stack([
                     rng.choice(N2D, 300, replace=False),
                     rng.choice(P, 300, replace=False)]).astype(np.int64))
        images.append({"id": i, "img_file": f"{root}/color/{i}.png"})
        annos.append({"image_id": i, "anno2d_file": ap,
                      "avg_anno3d_file": f"{root}/anno_3d_average.npz",
                      "collect_anno3d_file": f"{root}/anno_3d_collect.npz",
                      "idxs_file": f"{root}/idxs.npy"})
    with open(f"{root}/train.json", "w") as f:
        json.dump({"images": images, "annotations": annos}, f)
    open(f"{root}/done", "w").write("1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/onepose_train_bench")
    args = ap.parse_args()
    if not os.path.exists(f"{args.root}/done"):
        build_dataset(args.root)
        print("dataset built", flush=True)

    import jax
    import jax.numpy as jnp

    from onepose_tpu.datasets.gats_dataset import GATsSPGDataset
    from onepose_tpu.runtime.loader import stage_ahead
    from onepose_tpu.train import trainer

    ds = GATsSPGDataset(f"{args.root}/train.json", num_leaf=L,
                        split="train", shape2d=S2, shape3d=S3)
    tx = trainer.make_optimizer(base_lr=1e-3, milestones_steps=[1000])
    state = trainer.init_train_state(jax.random.PRNGKey(0), tx, None)
    db_np, obj_index = ds.device_db()
    db = {k: jnp.asarray(db_np[k]) for k in
          ("clt_stack", "avg_stack", "count_stack", "offset_stack")}
    step = trainer.make_gather_train_step(tx, None, db, S2, S3, 0,
                                          num_leaf=L)

    def run_epoch(on_device_leaves, staged):
        nonlocal state
        n = 0
        t0 = time.perf_counter()
        it = ds.light_batches(obj_index, db_np["t_max"], B, shuffle=True,
                              seed=1, on_device_leaves=on_device_leaves)
        if staged:
            it = stage_ahead(
                it,
                lambda lb: {k: jax.device_put(v) for k, v in lb.items()})
        loss = None
        for lb in it:
            state, loss = step(state, {k: jnp.asarray(v)
                                       for k, v in lb.items()})
            n += B
        float(loss)
        return n / (time.perf_counter() - t0)

    for name, dev_leaves, staged in (
            ("light+host-leaf-sampling  ", False, False),
            ("light+device-leaf-sampling", True, False),
            ("  + staged uploads        ", True, True)):
        run_epoch(dev_leaves, staged)  # warm
        r = max(run_epoch(dev_leaves, staged) for _ in range(2))
        print(f"{name}: {r:6.1f} items/s", flush=True)

    lb = next(ds.light_batches(obj_index, db_np["t_max"], B, seed=1,
                               on_device_leaves=True))
    lbj = {k: jnp.asarray(v) for k, v in lb.items()}
    state, loss = step(state, lbj)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(30):
        state, loss = step(state, lbj)
    float(loss)
    print(f"step-only ceiling         : "
          f"{30 * B / (time.perf_counter() - t0):6.1f} items/s", flush=True)


if __name__ == "__main__":
    main()
