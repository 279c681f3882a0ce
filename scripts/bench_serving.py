#!/usr/bin/env python
"""Steady-state multi-object serving throughput on the real chip.

The reference's eval protocol covers 81 objects (test_GATsSPG.yaml:26-106);
this measures the serve step with the FULL 81-object catalog resident at
protocol shapes (shape3d=2000, num_leaf=8, 512x512 crops, max_keypoints
1024) — the single-chip deployment shape. Chained-launch protocol (one
scalar fetch per block, first block thrown away — docs/DESIGN.md §8).

Prints one JSON line {"serve_ms_per_batch8", "req_per_s", "catalog_mb",
"n_objects"}.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from onepose_tpu import serving
    from onepose_tpu.datasets import anno
    from onepose_tpu.models import gats_spg, superpoint

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    sp_params = superpoint.init_params(key)
    gats_params = gats_spg.init_params(key)

    def make_db(rng):
        P = 2000 - 8
        idxs = rng.integers(2, 10, P)
        total = int(idxs.sum())
        return anno.build_object_db(
            avg_keypoints3d=rng.uniform(
                -0.1, 0.1, (P, 3)).astype(np.float32),
            avg_descriptors3d=rng.normal(size=(256, P)).astype(np.float32),
            avg_scores3d=rng.uniform(0, 1, (P, 1)).astype(np.float32),
            clt_descriptors=rng.normal(
                size=(256, total)).astype(np.float32),
            clt_scores=rng.uniform(0, 1, (total, 1)).astype(np.float32),
            idxs=idxs, num_leaf=8, shape3d=2000)

    import argparse
    import time as _t

    ap = argparse.ArgumentParser()
    # 81 = the full test-split catalog. NOTE: on the tunneled AOT
    # compiler the 81-object serve step did not finish compiling within
    # 15 min (8 objects: 185 s) — run with --n-objects 8 there; the
    # virtual-mesh CPU test (test_serving.py) proves 81-object
    # functional correctness.
    ap.add_argument("--n-objects", type=int, default=81)
    ap.add_argument("--uniform", action="store_true",
                    help="time the uniform-batch fast path (all requests "
                         "in a batch name the same object) instead of the "
                         "mixed-object program")
    args = ap.parse_args()

    t0 = _t.time()
    n_objects = args.n_objects
    dbs = {f"obj{i:02d}": make_db(rng) for i in range(n_objects)}
    print(f"[bench_serving] built {n_objects} DBs in {_t.time()-t0:.0f}s",
          flush=True)
    catalog_mb = sum(db.descriptors3d.nbytes + db.descriptors2d_db.nbytes
                     + db.keypoints3d.nbytes
                     for db in dbs.values()) / 1e6

    t0 = _t.time()
    server = serving.PoseServer(
        sp_params, gats_params, dbs, sp_config={"max_keypoints": 1024},
        batch_size=8, num_hypotheses=512, seed=1)
    print(f"[bench_serving] catalog resident in {_t.time()-t0:.0f}s",
          flush=True)

    B, H, W = 8, 512, 512
    images = jax.device_put(
        rng.uniform(0, 1, (B, H, W, 1)).astype(np.float32))
    Ks = jax.device_put(np.broadcast_to(
        np.array([[460.0, 0, W / 2], [0, 460.0, H / 2], [0, 0, 1]],
                 np.float32), (B, 3, 3)).copy())
    if args.uniform:
        obj_idx = jax.device_put(
            np.full((B,), n_objects // 2, np.int32))
    else:
        obj_idx = jax.device_put(
            (np.arange(B * 7) % n_objects)[:B].astype(np.int32))
    keys = jax.random.split(jax.random.PRNGKey(1), B)

    from onepose_tpu.serving import _serve_step_impl

    # Single-dispatch chain (bench.py r3 protocol): the whole iteration is
    # ONE jitted scalar→scalar program so slow-tunnel-hour per-dispatch
    # overhead cannot inflate the number. The catalog is passed as an
    # ARGUMENT — closure-capturing it would embed it in the program as a
    # compile-time constant and hang the remote compiler on big catalogs.
    @jax.jit
    def f(e, sp_params, gats_params, db_stack, obj_idx, images, Ks, keys):
        out = _serve_step_impl(
            sp_params, gats_params, db_stack, obj_idx,
            images + e * 1e-30, Ks, keys, server.sp_config_items,
            server.gats_config_items, 5.0, 512, 5,
            uniform=args.uniform)
        return jnp.sum(out.poses)

    from onepose_tpu.utils.chipbench import chain_blocks

    operands = (server.sp_params, server.gats_params, server.db_stack,
                obj_idx, images, Ks, keys)
    t0 = _t.time()
    times = chain_blocks(f, operands, n_iters=20, blocks=6)
    print(f"[bench_serving] compiled+ran in {_t.time()-t0:.0f}s",
          flush=True)
    ms = float(np.median(times))
    print(json.dumps({
        "serve_ms_per_batch8": round(ms, 2),
        "req_per_s": round(B / ms * 1000, 1),
        "catalog_mb": round(catalog_mb, 0),
        "n_objects": n_objects,
        "uniform": bool(args.uniform),
    }))


if __name__ == "__main__":
    main()
