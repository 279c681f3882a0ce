#!/usr/bin/env python
"""Per-frame BATracker latency on the real chip.

The tracker's per-frame cost is TWO fused dispatches (track step with
flow/association/PnP/triangulation, then the windowed-BA solve), each
with one host fetch — docs/DESIGN.md §10b. This measures the warm
steady-state wall latency of `BATracker.track()` on a synthetic
textured-plane sequence at demo shapes (512x512 crop, 512 keypoint
slots, 256-d descriptors) so the round-trip count claim is a
measurement, not an extrapolation.

Prints one JSON line {"track_ms_median", "track_ms_p90", "frames",
"r_err_deg_max", "t_err_cm_max"}.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_sequence(rng, n_frames, n_points=400, hw=512, desc_dim=256):
    """Textured plane z=0 viewed under a slowly moving camera; images are
    exact homography warps so LK flow sees real, consistent content
    (pattern: tests/test_tracker.py::make_plane_sequence)."""
    import cv2

    from onepose_tpu.utils import geometry as geo

    K = np.array([[460.0, 0, hw / 2], [0, 460.0, hw / 2], [0, 0, 1]])
    tex_res = 640
    tex = cv2.resize(
        rng.uniform(0, 1, (80, 80)).astype(np.float32),
        (tex_res, tex_res), interpolation=cv2.INTER_CUBIC)
    scale = tex_res / 0.4
    T_plane = np.array([[scale, 0, 0.2 * scale],
                        [0, scale, 0.2 * scale],
                        [0, 0, 1]])
    pts3d = np.concatenate([
        rng.uniform(-0.15, 0.15, (n_points, 2)),
        np.zeros((n_points, 1))], axis=1)
    descs = rng.normal(size=(n_points, desc_dim)).astype(np.float32)

    frames = []
    for i in range(n_frames):
        R = geo.rodrigues([0.25 + 0.02 * i, 0.03 * i, 0.01 * i])
        t = np.array([0.004 * i, -0.002 * i, 0.5])
        pose = np.concatenate([R, t[:, None]], axis=1)
        H_img = K @ np.stack([R[:, 0], R[:, 1], t], axis=1)
        H = H_img @ np.linalg.inv(T_plane)
        img = cv2.warpPerspective(tex, H.astype(np.float32), (hw, hw))
        uv = geo.project_points(pts3d, K, pose)
        frames.append({
            "image": img,
            "pose": pose,
            "keypoints": (uv + rng.normal(size=uv.shape) * 0.3
                          ).astype(np.float32),
            "descriptors": descs + 0.02 * rng.normal(
                size=descs.shape).astype(np.float32),
        })
    return K, pts3d, frames


def main():
    from onepose_tpu import tracker as tracker_mod
    from onepose_tpu.tracker import BATracker
    from onepose_tpu.utils import geometry as geo

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--warmup", type=int, default=6,
                    help="tracked frames excluded from timing (compiles)")
    ap.add_argument("--breakdown", action="store_true",
                    help="also attribute the per-frame wall time: host "
                         "round-trip (RTT) vs on-device kernel time for "
                         "each of the two fused dispatches")
    ap.add_argument("--uint8", action="store_true",
                    help="feed frames as uint8 (1 byte/px on the wire, "
                         "normalized on device — tracker._img_unit_f32); "
                         "bit-identical to feeding u/255 as f32")
    args = ap.parse_args()
    if args.warmup >= args.frames:
        ap.error(f"--warmup ({args.warmup}) must be < --frames "
                 f"({args.frames}): no timed frames would remain")

    rng = np.random.default_rng(0)
    n_slots = 512
    K, pts3d, frames = make_sequence(rng, args.frames + 1)
    n = len(pts3d)
    if args.uint8:
        for fr in frames:
            fr["image"] = np.clip(np.round(fr["image"] * 255.0), 0,
                                  255).astype(np.uint8)

    # pad keypoints to a static slot budget (the demo path's shape
    # contract; the tracker never retraces across frames then)
    def padded(fr):
        kp = np.zeros((n_slots, 2), np.float32)
        ds = np.zeros((n_slots, frames[0]["descriptors"].shape[1]),
                      np.float32)
        mask = np.zeros(n_slots, bool)
        kp[:n] = fr["keypoints"]
        ds[:n] = fr["descriptors"]
        mask[:n] = True
        return kp, ds, mask

    # --breakdown: capture the exact operands of the two fused per-frame
    # dispatches so they can be re-timed in isolation after the loop
    captured = {}
    if args.breakdown:
        orig_track_step = tracker_mod._track_step
        orig_ba_step = tracker_mod._window_ba_step

        def cap_track(*a):
            captured["track"] = a
            return orig_track_step(*a)

        def cap_ba(*a):
            captured["ba"] = a
            return orig_ba_step(*a)

        tracker_mod._track_step = cap_track
        tracker_mod._window_ba_step = cap_ba

    tracker = BATracker(win_size=10, pnp_hypotheses=256, ba_iterations=8)
    kp, ds, mask = padded(frames[0])
    kpt_idx = np.arange(n)
    if not tracker.add_keyframe(frames[0]["image"], kp, ds, mask,
                                frames[0]["pose"], K,
                                mkpts3d=pts3d, kpt_indices=kpt_idx):
        raise SystemExit("bench_tracker: initial add_keyframe failed")

    times_ms, r_errs, t_errs = [], [], []
    for i in range(1, args.frames + 1):
        kp, ds, mask = padded(frames[i])
        t0 = time.perf_counter()
        pose, info = tracker.track(frames[i]["image"], kp, ds, mask, K)
        dt = (time.perf_counter() - t0) * 1000.0
        if pose is None:
            raise SystemExit(
                f"bench_tracker: track() lost the object at frame {i} "
                f"({info}) — latency numbers would be meaningless")
        r_err, t_err = geo.query_pose_error(pose, frames[i]["pose"])
        r_errs.append(r_err)
        t_errs.append(t_err)
        if i > args.warmup:
            times_ms.append(dt)
        print(f"[bench_tracker] frame {i:02d}: {dt:7.1f} ms  "
              f"mode={info['mode']} tracked={info.get('num_tracked')} "
              f"r={r_err:.2f}deg t={t_err:.2f}cm", flush=True)

    out = {
        "track_ms_median": round(float(np.median(times_ms)), 1),
        "track_ms_p90": round(float(np.percentile(times_ms, 90)), 1),
        "frames": len(times_ms),
        "r_err_deg_max": round(float(np.max(r_errs)), 2),
        "t_err_cm_max": round(float(np.max(t_errs)), 2),
    }

    if args.breakdown:
        import jax
        import jax.numpy as jnp

        from onepose_tpu.utils.chipbench import chain_time

        # NOTE: jax.block_until_ready returns before execution completes
        # on the tunneled backend (verify SKILL.md gotcha) — every timing
        # here forces a real host FETCH of a scalar instead.
        def timed_fetch(fn, reps=20):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()  # must end in a host fetch
                ts.append((time.perf_counter() - t0) * 1000.0)
            return float(np.median(ts))

        # pure dispatch+fetch round trip on a trivial scalar program: the
        # floor any single synchronous dispatch pays on this link
        trivial = jax.jit(lambda x: x + 1.0)
        x0 = jnp.float32(0.0)
        float(trivial(x0))  # compile + first exec
        rtt = timed_fetch(lambda: float(trivial(x0)))

        def scalarize(tree):
            leaves = [x for x in jax.tree.leaves(tree)
                      if hasattr(x, "dtype")]
            return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

        brk = {"rtt_ms": round(rtt, 1)}

        # per-frame HOST->DEVICE upload cost: the tracked loop uploads a
        # fresh image + keypoints + descriptors every frame; on an HTTP
        # tunnel this is a real per-frame term the dispatch timings
        # cannot see. Fetch a scalar that depends on the uploaded data.
        kp_h, ds_h, mask_h = padded(frames[1])
        img_h = frames[1]["image"]
        up_bytes = (img_h.nbytes + kp_h.nbytes + ds_h.nbytes
                    + mask_h.nbytes)
        touch = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.float32))
                                       for x in a))
        float(touch(jax.device_put(img_h), jax.device_put(kp_h),
                    jax.device_put(ds_h), jax.device_put(mask_h)))

        def upload_once():
            d = [jax.device_put(x) for x in (img_h, kp_h, ds_h, mask_h)]
            return float(touch(*d))

        brk["upload_ms"] = round(timed_fetch(upload_once) - rtt, 1)
        brk["upload_bytes"] = int(up_bytes)

        # each fused dispatch re-timed on its captured (warm, device-
        # resident) operands through the chained-scalar protocol:
        # chained_ms isolates device+dispatch cost (RTT amortized over
        # n_iters); sync_ms = one dispatch + one fetch, the latency a
        # caller actually observes per call.
        for name, f, key_, n_static in (
                ("track_step", orig_track_step, "track", 2),
                ("ba_step", orig_ba_step, "ba", 3)):
            a = captured.get(key_)
            if a is None:
                continue
            arrs, statics = a[:-n_static], a[-n_static:]

            @jax.jit
            def g(e, *arrs, _f=f, _st=statics):
                first = arrs[0] + e * jnp.asarray(1e-30, arrs[0].dtype)
                return scalarize(
                    _f(first, *arrs[1:], *_st)).astype(jnp.float32)

            brk[name + "_chained_ms"] = round(
                chain_time(g, arrs, n_iters=10, blocks=3), 1)
            brk[name + "_sync_ms"] = round(
                timed_fetch(lambda: float(scalarize(f(*a)))), 1)
        out["breakdown"] = brk

    print(json.dumps(out))


if __name__ == "__main__":
    main()
