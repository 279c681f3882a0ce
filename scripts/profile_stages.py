#!/usr/bin/env python
"""Per-stage device-compute profiling on the real chip.

Timing protocol for the tunneled backend (see docs/DESIGN.md §8):
- launches are async (~0.2 ms) but every host fetch costs a ~29 ms HTTP
  round trip, so each measurement chains N launches through a scalar
  dependency and fetches ONE scalar at the end;
- each chained iteration is ONE jitted scalar→scalar program — chaining
  several dispatches per iteration from Python lets slow-tunnel-hour
  per-dispatch overhead inflate the reading (§8, r3 finding);
- every operand is passed as an ARGUMENT, never closure-captured:
  captured device arrays become compile-time constants and XLA folds
  data-independent work out of the measurement (§8, r3 finding — this
  hid an 8 ms PnP regression);
- the first chained block after compile absorbs a hidden warm-up
  (autotuning / first real execution) that can cost seconds — every
  measurement runs a throwaway block first and reports the best of the
  remaining blocks.

Caveat that remains: timing a stage in ISOLATION still differs from its
in-context cost inside the fused pipeline (different fusion/layout
decisions). bench.py's cumulative-prefix stages are the in-context
numbers; these are for comparing implementation variants of one stage.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onepose_tpu.utils.chipbench import chain_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from onepose_tpu import pipeline
    from onepose_tpu.datasets import anno
    from onepose_tpu.models import gats_spg, superpoint

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    sp = superpoint.init_params(key)
    gp = gats_spg.init_params(key)
    B, H, W = 8, 512, 512
    img = jax.device_put(rng.uniform(0, 1, (B, H, W, 1)).astype(np.float32))

    rows = []

    def report(name, ms):
        rows.append((name, ms))
        print(f"{name:40s} {ms:8.2f} ms/batch-{B}")

    # --- SuperPoint pieces ---
    @jax.jit
    def f_stem(e, sp, img):
        x = jax.nn.relu(superpoint._conv2d(img + e * 1e-30, sp["conv1a"]))
        x = jax.nn.relu(superpoint._conv2d(x, sp["conv1b"]))
        return jnp.sum(superpoint._maxpool2(x))

    report("sp stem (conv1a+1b+pool)", chain_time(f_stem, (sp, img)))

    @jax.jit
    def f_dense(e, sp, img):
        return sum(jnp.sum(t)
                   for t in superpoint.dense_heads(sp, img + e * 1e-30))

    report("sp dense_heads fp32", chain_time(f_dense, (sp, img)))

    @jax.jit
    def f_dense_bf(e, sp, img):
        return sum(jnp.sum(t) for t in
                   superpoint.dense_heads(sp, img + e * 1e-30, "bfloat16"))

    report("sp dense_heads bf16", chain_time(f_dense_bf, (sp, img)))

    cfg = dict(superpoint.DEFAULT_CONFIG)
    cfg["max_keypoints"] = 1024
    citems = tuple(sorted(cfg.items()))

    @jax.jit
    def f_full(e, sp, img):
        o = superpoint._extract_jit(sp, img + e * 1e-30, citems)
        return (jnp.sum(o.scores) + jnp.sum(o.descriptors)
                + jnp.sum(o.keypoints))

    report("sp extract (dense+nms+select)", chain_time(f_full, (sp, img)))

    # --- GATs matcher ---
    d2q = jax.device_put(rng.normal(size=(B, 1024, 256)).astype(np.float32))
    d3 = jax.device_put(rng.normal(size=(B, 2000, 256)).astype(np.float32))
    d2db = jax.device_put(
        rng.normal(size=(B, 16000, 256)).astype(np.float32))
    m2 = jax.device_put(np.ones((B, 1024), bool))
    m3 = jax.device_put(np.ones((B, 2000), bool))
    gcfg = dict(gats_spg.DEFAULT_CONFIG)
    match_ops = (gp, d2q, d3, d2db, m2, m3)

    @jax.jit
    def f_match(e, gp, d2q, d3, d2db, m2, m3):
        data = {"descriptors2d_query": d2q + e * 1e-30,
                "descriptors3d_db": d3,
                "descriptors2d_db": d2db, "mask2d": m2, "mask3d": m3}
        return jnp.sum(gats_spg.forward(gp, data, gcfg).matching_scores0)

    report("gats matcher fp32", chain_time(f_match, match_ops))

    gcfg_bf = dict(gcfg)
    gcfg_bf["compute_dtype"] = "bfloat16"

    @jax.jit
    def f_match_bf(e, gp, d2q, d3, d2db, m2, m3):
        data = {"descriptors2d_query": d2q + e * 1e-30,
                "descriptors3d_db": d3,
                "descriptors2d_db": d2db, "mask2d": m2, "mask3d": m3}
        return jnp.sum(gats_spg.forward(gp, data, gcfg_bf).matching_scores0)

    report("gats matcher bf16", chain_time(f_match_bf, match_ops))

    # --- PnP ---
    k2 = jax.device_put(rng.uniform(0, 512, (B, 1024, 2)).astype(np.float32))
    k3 = jax.device_put(
        rng.uniform(-0.1, 0.1, (B, 2000, 3)).astype(np.float32))
    m0 = jax.device_put(rng.integers(-1, 2000, (B, 1024)).astype(np.int32))
    msk = jax.device_put(np.ones((B, 1024), bool))
    Ks = jax.device_put(np.broadcast_to(
        np.array([[460., 0, 256], [0, 460., 256], [0, 0, 1]], np.float32),
        (B, 3, 3)).copy())
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    pnp_ops = (k2, msk, m0, k3, Ks, keys)

    for nh in (512, 256):
        @jax.jit
        def f_pnp(e, k2, msk, m0, k3, Ks, keys, nh=nh):
            p = pipeline.poses_from_matches(
                k2 + e * 1e-30, msk, m0, k3, Ks, keys,
                reproj_threshold=5.0, num_hypotheses=nh, refine_iters=5)
            return jnp.sum(p.pose)

        report(f"pnp {nh} hypotheses", chain_time(f_pnp, pnp_ops))

    # --- full pipeline (one jitted program per chain iteration) ---
    P = 2000 - 8
    idxs = rng.integers(8, 24, P)
    total = int(idxs.sum())
    db = anno.build_object_db(
        avg_keypoints3d=rng.uniform(-0.1, 0.1, (P, 3)).astype(np.float32),
        avg_descriptors3d=rng.normal(size=(256, P)).astype(np.float32),
        avg_scores3d=rng.uniform(0, 1, (P, 1)).astype(np.float32),
        clt_descriptors=rng.normal(size=(256, total)).astype(np.float32),
        clt_scores=rng.uniform(0, 1, (total, 1)).astype(np.float32),
        idxs=idxs, num_leaf=8, shape3d=2000)
    pipe = pipeline.PosePipeline(
        sp, gp, db, sp_config={"max_keypoints": 1024}, num_hypotheses=512)

    @jax.jit
    def f_pipe(e, sp_params, gats_params, dbt, img, Ks, keys):
        r = pipeline._frame_to_pose_jit(
            sp_params, gats_params, dbt, img + e * 1e-30, Ks, keys,
            pipe.sp_config_items, pipe.gats_config_items,
            pipe.reproj_threshold, pipe.num_hypotheses, pipe.refine_iters,
            pipe.use_pallas_match)
        return jnp.sum(r.poses)

    ms = chain_time(
        f_pipe,
        (pipe.sp_params, pipe.gats_params, pipe.db, img, Ks,
         jnp.asarray(keys)))
    report("FULL pipeline", ms)
    print(f"device throughput: {B / ms * 1000:.1f} frames/s")


if __name__ == "__main__":
    main()
