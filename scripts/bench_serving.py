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


def run_latency_sweep(server, n_objects: int, args):
    """Per-request latency distribution vs offered load through the async
    latency-triggered batching path (PoseServer.submit + _serve_loop) —
    the number a serving layer exists to control (VERDICT r4 Next #4).

    Capacity anchor: the synchronous per-batch wall time (dispatch +
    fetch), which is what the serial serve loop can sustain. Offered
    loads are Poisson arrivals at fractions of that capacity, including
    one overload point past the knee.
    """
    import json
    import time

    from onepose_tpu import serving as serving_mod

    rng = np.random.default_rng(7)
    H = W = 512
    img = rng.uniform(0, 1, (H, W)).astype(np.float32)
    K = np.array([[460.0, 0, W / 2], [0, 460.0, H / 2], [0, 0, 1]],
                 np.float32)

    def req(j):
        return serving_mod.PoseRequest(f"obj{j % n_objects:02d}", img, K)

    warm = [req(j) for j in range(server.batch_size)]
    t0 = time.time()
    server.infer_batch(warm)  # compile
    print(f"[bench_serving] serve step compiled in {time.time()-t0:.0f}s",
          flush=True)
    t0 = time.perf_counter()
    reps = 6
    for _ in range(reps):
        server.infer_batch(warm)
    batch_wall_ms = (time.perf_counter() - t0) / reps * 1000.0
    capacity = server.batch_size / batch_wall_ms * 1000.0  # req/s

    server.start()
    points = []
    try:
        for frac in (0.25, 0.5, 0.75, 0.9, 1.2):
            rate = capacity * frac
            n_req = args.latency_requests
            lats = []
            futs = []
            arr = np.random.default_rng(int(frac * 100)).exponential(
                1.0 / rate, n_req).cumsum()
            start = time.perf_counter()
            for j in range(n_req):
                while time.perf_counter() - start < arr[j]:
                    time.sleep(0.0002)
                ts = time.perf_counter()
                fut = server.submit(req(j))
                fut.add_done_callback(
                    lambda f, ts=ts: lats.append(
                        (time.perf_counter() - ts) * 1000.0))
                futs.append(fut)
            for f in futs:
                f.result(timeout=120)
            wall = time.perf_counter() - start
            p50, p95, p99 = np.percentile(lats, [50, 95, 99])
            points.append({
                "offered_frac": frac,
                "offered_req_per_s": round(rate, 1),
                "achieved_req_per_s": round(n_req / wall, 1),
                "p50_ms": round(float(p50), 1),
                "p95_ms": round(float(p95), 1),
                "p99_ms": round(float(p99), 1),
            })
            print(f"[bench_serving] load {frac:.2f}x: {points[-1]}",
                  flush=True)
    finally:
        server.stop()

    print(json.dumps({
        "metric": "serving_latency_sweep",
        "n_objects": n_objects,
        "batch_size": server.batch_size,
        "assembly_timeout_ms": round(server.max_latency_s * 1000.0, 1),
        "sync_batch_wall_ms": round(batch_wall_ms, 2),
        "capacity_req_per_s": round(capacity, 1),
        "points": points,
    }))


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
    ap.add_argument("--latency", action="store_true",
                    help="drive the async latency-triggered batching path "
                         "at several offered loads and report per-request "
                         "p50/p95/p99 latency + the throughput-latency "
                         "knee (VERDICT r4 Next #4), instead of the "
                         "saturation chained-protocol number")
    ap.add_argument("--latency-requests", type=int, default=240,
                    help="requests per offered-load point")
    ap.add_argument("--max-latency-ms", type=float, default=20.0,
                    help="server batch-assembly timeout (max_latency_s)")
    args = ap.parse_args()

    from onepose_tpu.utils.jax_cache import enable_persistent_cache

    cache_dir = enable_persistent_cache()
    print(f"[bench_serving] persistent compile cache: {cache_dir}",
          flush=True)

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
        batch_size=8, num_hypotheses=512, seed=1,
        max_latency_s=args.max_latency_ms / 1000.0)
    print(f"[bench_serving] catalog resident in {_t.time()-t0:.0f}s",
          flush=True)

    if args.latency:
        run_latency_sweep(server, n_objects, args)
        return

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
