#!/usr/bin/env python
"""Benchmark: fused frame→pose throughput on one TPU chip.

Protocol shapes match the reference eval pipeline (512x512 GT-box crops,
max_keypoints=1024, shape3d=2000, num_leaf=8, RANSAC 5px — see
/root/reference/configs/experiment/test_GATsSPG.yaml and BASELINE.md).

Baseline denominator: the reference torch-CPU frame→pose path (SuperPoint →
GATsSPG → cv2.solvePnPRansac) measured at the same shapes on this image's
8-thread CPU: 0.625 frames/sec (see BASELINE.md "Measured baseline").

Prints one JSON line:
  {"metric", "value", "unit", "vs_baseline",      # headline (median fps)
   "iqr": [q25, q75],                             # over counted blocks
   "blocks": N,                                   # counted blocks
   "stages": {"extract_ms", "match_ms", "pnp_ms", "total_ms"},  # per batch
   "mfu": f, "tflops_per_sec": f}                 # XLA-counted FLOPs / peak

The IQR makes run-to-run variance visible (the tunnel shows ±8% across
runs of the same binary — BASELINE.md), and the per-stage ms make any
round-over-round delta attributable to a specific stage.
"""
import json
import os

import numpy as np

REF_CPU_FPS = 0.625  # measured reference baseline (BASELINE.md)

# Measurement protocol identifier. Bump whenever the timing methodology
# changes (r3: single-dispatch chained blocks + cumulative-prefix stage
# attribution — DESIGN.md §8). Numbers across different protocol strings
# are NOT comparable; this stamp makes that machine-readable after the
# r2→r3 protocol break confused the cross-round series (VERDICT r3 §Weak 2).
PROTOCOL = "r3-single-dispatch"

# bench.py numbers are only valid on an otherwise-idle box: this host has
# ONE CPU core and a loaded box starves the dispatch loop (measured 256
# "fps" under load vs 390 quiet with identical on-chip stage timings —
# TODO.md BENCH NOTE). Flag it in the JSON instead of silently reporting
# a host-bound number.
LOADAVG_IDLE_MAX = 0.5


def host_load() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except (OSError, ValueError, IndexError):
        return -1.0

BATCH = 8
H = W = 512
MAX_KPTS = 1024
SHAPE3D = 2000
NUM_LEAF = 8
NUM_HYPOTHESES = 512

# bf16 peak matmul throughput per chip, FLOP/s (public spec sheets).
PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,      # v5p
    "TPU v6 lite": 918e12,  # v6e / Trillium
}

# HBM bandwidth per chip, bytes/s (public spec sheets).
PEAK_HBM_BPS = {
    "TPU v4": 1228e9,
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
    "TPU v5": 2765e9,      # v5p
    "TPU v6 lite": 1640e9,  # v6e / Trillium
}


def main():
    load1 = host_load()
    if load1 > LOADAVG_IDLE_MAX and not os.environ.get("BENCH_IGNORE_LOAD"):
        import sys
        import time
        # Give transient load (e.g. a just-finished test run) a bounded
        # window to drain, then REFUSE rather than print a misleading
        # number (ADVICE r4: the old single-sleep path proceeded
        # unconditionally and only flagged host_idle in the JSON).
        for attempt in range(8):  # up to 8 min
            print(f"bench.py: 1-min loadavg {load1:.2f} > {LOADAVG_IDLE_MAX}"
                  " on a 1-core host; waiting 60s for it to drain "
                  f"[{attempt + 1}/8] (set BENCH_IGNORE_LOAD=1 to measure "
                  "anyway)...", file=sys.stderr)
            time.sleep(60)
            load1 = host_load()
            if load1 <= LOADAVG_IDLE_MAX:
                break
        else:
            print(f"bench.py: host still loaded ({load1:.2f}) after 8 min; "
                  "refusing to emit a host-bound number. Re-run on an idle "
                  "box or set BENCH_IGNORE_LOAD=1.", file=sys.stderr)
            sys.exit(3)

    import jax
    import jax.numpy as jnp

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
        # mirrors the inference-surface default (bf16 DIRECT stem,
        # gate-validated by scripts/stem_dtype_gate.py --stem direct —
        # DESIGN §6d; the in-situ extract winner, §6b)
        sp_config={"max_keypoints": MAX_KPTS, "stem_dtype": "bfloat16",
                   "stem": "direct", "compute_dtype": "bfloat16"},
        num_hypotheses=NUM_HYPOTHESES)

    images = jax.device_put(
        rng.uniform(0, 1, (BATCH, H, W, 1)).astype(np.float32))
    Ks = jax.device_put(np.broadcast_to(
        np.array([[460.0, 0, W / 2], [0, 460.0, H / 2], [0, 0, 1]],
                 np.float32), (BATCH, 3, 3)).copy())
    keys = jax.random.split(jax.random.PRNGKey(1), BATCH)

    # Measurement protocol (r3 revision): docs/DESIGN.md §8, implemented
    # once in onepose_tpu/utils/chipbench.py (chained scalar→scalar
    # programs, one fetch per block, throwaway first block, and EVERY
    # operand passed as an argument — closure-captured device arrays
    # become compile-time constants and XLA folds data-independent work
    # out of the measurement; that mechanism hid an 8 ms PnP regression
    # in r3 and would equally let DB-/param-only work vanish from the
    # extract/match prefixes here).
    from onepose_tpu.utils.chipbench import chain_blocks

    sp_cfg_items = pipe.sp_config_items
    gats_cfg_items = pipe.gats_config_items
    sp_cfg = dict(sp_cfg_items)
    gats_cfg = dict(gats_cfg_items)
    n2 = db.descriptors3d.shape[0]

    def _detect(e, sp_params, images):
        return superpoint.extract(sp_params, images + e * 1e-30, sp_cfg)

    def _match(det, gats_params, dbt):
        data = {
            "descriptors2d_query": det.descriptors,
            "descriptors3d_db": jnp.broadcast_to(
                dbt["descriptors3d"][None], (BATCH, n2, 256)),
            "descriptors2d_db": jnp.broadcast_to(
                dbt["descriptors2d_db"][None],
                (BATCH,) + dbt["descriptors2d_db"].shape),
            "mask2d": det.mask,
            "mask3d": jnp.broadcast_to(dbt["mask3d"][None], (BATCH, n2)),
        }
        return gats_spg.forward(gats_params, data, gats_cfg)

    @jax.jit
    def p1(e, sp_params, gats_params, dbt, images, Ks, keys):
        det = _detect(e, sp_params, images)
        return (jnp.sum(det.keypoints) + jnp.sum(det.descriptors)
                + jnp.sum(det.scores))

    @jax.jit
    def p2(e, sp_params, gats_params, dbt, images, Ks, keys):
        det = _detect(e, sp_params, images)
        m = _match(det, gats_params, dbt)
        return jnp.sum(m.matching_scores0) + jnp.sum(det.keypoints)

    @jax.jit
    def p3(e, sp_params, gats_params, dbt, images, Ks, keys):
        out = pipeline._frame_to_pose_jit(
            sp_params, gats_params, dbt, images + e * 1e-30, Ks, keys,
            sp_cfg_items, gats_cfg_items, pipe.reproj_threshold,
            pipe.num_hypotheses, pipe.refine_iters, pipe.use_pallas_match)
        return jnp.sum(out.poses)

    operands = (pipe.sp_params, pipe.gats_params, pipe.db, images, Ks,
                jnp.asarray(keys))

    def timed_blocks(f, blocks):
        return chain_blocks(f, operands, n_iters=20, blocks=blocks)

    ms_samples = timed_blocks(p3, blocks=8)
    total_ms = float(np.median(ms_samples))
    fps_samples = [BATCH / ms * 1000 for ms in ms_samples]
    fps = float(np.median(fps_samples))
    q25, q75 = np.percentile(fps_samples, [25, 75])

    extract_ms = float(np.median(timed_blocks(p1, blocks=3)))
    prefix2_ms = float(np.median(timed_blocks(p2, blocks=3)))
    stages = {
        "extract_ms": round(extract_ms, 2),
        "match_ms": round(prefix2_ms - extract_ms, 2),
        "pnp_ms": round(total_ms - prefix2_ms, 2),
        "total_ms": round(total_ms, 2),
    }

    # --- FLOP-based MFU (XLA cost analysis of the full fused program) ---
    # and the per-stage roofline (VERDICT r4 Next #3): FLOPs AND bytes
    # accessed per stage vs chip peaks → which stages are bandwidth-bound
    # and what the best-achievable total_ms is under this toolchain.
    mfu = tflops = None
    roofline = None
    kind = jax.devices()[0].device_kind
    peak_flops = next((v for k, v in PEAK_FLOPS.items() if k in kind), None)
    peak_bw = next((v for k, v in PEAK_HBM_BPS.items() if k in kind), None)

    def cost_of(f):
        cost = f.lower(jnp.float32(0.0), *operands).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return (float(cost.get("flops", 0.0)),
                float(cost.get("bytes accessed", 0.0)))

    try:
        fl3, by3 = cost_of(p3)
        flops_per_batch = fl3
        if flops_per_batch > 0:
            tflops = flops_per_batch * fps / BATCH / 1e12
            if peak_flops is not None:
                mfu = tflops * 1e12 / peak_flops
        if peak_flops is not None and peak_bw is not None:
            fl1, by1 = cost_of(p1)
            fl2, by2 = cost_of(p2)
            # prefix differences, consistent with the stage-ms attribution
            stage_cost = {
                "extract": (fl1, by1, extract_ms),
                "match": (fl2 - fl1, by2 - by1, prefix2_ms - extract_ms),
                "pnp": (fl3 - fl2, by3 - by2, total_ms - prefix2_ms),
            }
            roofline = {}
            total_min = 0.0
            for name, (fl, by, meas) in stage_cost.items():
                t_fl = fl / peak_flops * 1e3
                t_by = by / peak_bw * 1e3
                lo = max(t_fl, t_by)
                total_min += lo
                roofline[name] = {
                    "flops_g": round(fl / 1e9, 1),
                    "bytes_mb": round(by / 1e6, 1),
                    "bound": "bytes" if t_by >= t_fl else "flops",
                    "bytes_bound_frac": round(
                        t_by / max(lo, 1e-12), 3),
                    "min_ms": round(lo, 2),
                    "measured_ms": round(meas, 2),
                    "roofline_eff": round(lo / max(meas, 1e-9), 3),
                }
            roofline["total_min_ms"] = round(total_min, 2)
    except Exception:
        pass

    print(json.dumps({
        "metric": "frames_per_sec_per_chip_frame_to_pose",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REF_CPU_FPS, 2),
        "iqr": [round(float(q25), 2), round(float(q75), 2)],
        "blocks": len(fps_samples),
        "stages": stages,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "tflops_per_sec": round(tflops, 2) if tflops is not None else None,
        "roofline": roofline,
        "protocol": PROTOCOL,
        "stem_dtype": "bfloat16",
        "stem": "direct",
        "compute_dtype": "bfloat16",
        "loadavg_1min": round(load1, 2),
        "host_idle": bool(0.0 <= load1 <= LOADAVG_IDLE_MAX),
    }))


if __name__ == "__main__":
    main()
