#!/usr/bin/env python
"""Reference-free decision gate for `stem_dtype="bfloat16"` (VERDICT r3
Next #2 / DESIGN §6c).

The bf16 stem (conv1a/conv1b in bf16 with fp32 accumulation) was measured
at -19% extract time on v5e but gated on "a cmd-metric parity bound once
real weights allow". This script builds that bound WITHOUT real assets:

Over N seeds (independent textures + SuperPoint weights) x M query frames
of the chain-parity dihedral world (tests/test_chain_parity.py — real
geometry, a 3D DB built from fp32 extraction, GT poses), run the SAME
fused frame->pose pipeline with stem fp32 vs stem bf16 (identical RANSAC
keys) and compare against the pipeline's OWN stochastic noise floor
(stem fp32 with two different RANSAC key sets):

- keypoint-set churn (Jaccard) and match-set churn,
- pose deltas: |pose(bf16) - pose(fp32)| vs |pose(keyA) - pose(keyB)|,
- GT pose-error deltas and cmd1/3/5 bucket flips.

Decision rule: flip the inference default iff the bf16-induced pose delta
is not larger than the solver's key-to-key noise floor AND no cmd bucket
flips beyond what the noise floor itself produces.

Runs on whatever backend the environment provides (the real chip under
the session env; CPU with JAX_PLATFORMS=cpu). Prints one JSON line.
"""
import json
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "tests"))

N_SEEDS = 4
THRESHOLDS = (1.0, 3.0, 5.0)


def run_seed(tcp, seed, results, stem="polyphase",
             compute_dtype="float32"):
    import jax

    import torch

    from onepose_tpu import pipeline
    from onepose_tpu.datasets import anno
    from onepose_tpu.sfm.extract import CONFS
    from onepose_tpu.models import convert
    from onepose_tpu.utils import geometry as geo

    rng = np.random.default_rng(100 + seed)
    planes = tcp.make_planes(rng)
    db_poses = tcp.camera_ring(7, elev_deg=62.0, az0=-27.0, az1=27.0)
    q_poses = tcp.camera_ring(5, elev_deg=66.0, az0=-18.0, az1=18.0,
                              elev_jitter=2.0)
    calib = tcp.render(planes, db_poses[0])
    sp_torch = tcp.build_superpoint(calib, seed=11 + seed)
    sp_params = convert.superpoint_from_state_dict(
        {k: v.numpy() for k, v in sp_torch.state_dict().items()})
    matcher = tcp.build_matcher()
    gats_params = convert.gats_spg_from_state_dict(matcher.state_dict())
    del sp_torch, matcher
    torch.manual_seed(0)  # keep torch state deterministic across seeds

    def extract_jax(img, stem_dtype):
        from onepose_tpu.models import superpoint

        conf = dict(CONFS["superpoint"]["conf"])
        conf["max_keypoints"] = tcp.MAX_KPTS
        conf["stem_dtype"] = stem_dtype
        return superpoint.extract(
            sp_params, np.asarray(img, np.float32)[None, ..., None], conf)

    # ---- DB from fp32 extraction on DB views + exact association ------
    clusters = {}
    for vi, pose in enumerate(db_poses):
        img = tcp.render(planes, pose)
        img = np.round(img * 255).astype(np.float32) / 255
        det = extract_jax(img, "float32")
        mask = np.asarray(det.mask[0])
        kpts = np.asarray(det.keypoints[0])[mask]
        desc = np.asarray(det.descriptors[0])[mask]
        scores = np.asarray(det.scores[0])[mask]
        hits = tcp.backproject(planes, pose, kpts)
        for ki, hit in enumerate(hits):
            if hit is None:
                continue
            pi, tx, ty = hit
            key = (pi, int(round(tx / 3.0)), int(round(ty / 3.0)))
            cl = clusters.setdefault(key, {})
            if vi not in cl:
                cl[vi] = (tcp.plane_point(planes, pi, tx, ty),
                          desc[ki], float(scores[ki]))
    good = [(k, cl) for k, cl in sorted(clusters.items())
            if 3 <= len(cl) <= 7]
    sep_m = 8.0 * 0.18 / tcp.TEX_RES
    kept, kept_pos = [], []
    for k, cl in good:
        xyz = np.mean([o[0] for o in cl.values()], axis=0)
        if any(np.linalg.norm(xyz - q) < sep_m for q in kept_pos):
            continue
        kept_pos.append(xyz)
        kept.append((k, cl))
    good = kept[:120]
    assert len(good) >= 50, f"seed {seed}: only {len(good)} clusters"

    xyzs, avg_desc, avg_scores, clt_desc, clt_scores, idxs = \
        [], [], [], [], [], []
    for _, cl in good:
        obs = [cl[vi] for vi in sorted(cl)]
        xyzs.append(np.mean([o[0] for o in obs], axis=0))
        ds = np.stack([o[1] for o in obs], axis=1)
        avg_desc.append(ds.mean(axis=1))
        avg_scores.append(np.mean([o[2] for o in obs]))
        clt_desc.append(ds)
        clt_scores.extend(o[2] for o in obs)
        idxs.append(len(obs))
    db = anno.build_object_db(
        avg_keypoints3d=np.asarray(xyzs, np.float32),
        avg_descriptors3d=np.stack(avg_desc, 1).astype(np.float32),
        avg_scores3d=np.asarray(avg_scores, np.float32)[:, None],
        clt_descriptors=np.concatenate(clt_desc, 1).astype(np.float32),
        clt_scores=np.asarray(clt_scores, np.float32)[:, None],
        idxs=np.asarray(idxs, np.int64), num_leaf=tcp.NUM_LEAF,
        shape3d=tcp.SHAPE3D)

    # ---- pipelines: fp32 baseline stem vs the variant under test ------
    def make_pipe(stem_dtype, stem, cdt="float32"):
        conf = dict(CONFS["superpoint"]["conf"])
        conf["max_keypoints"] = tcp.MAX_KPTS
        conf["stem_dtype"] = stem_dtype
        conf["stem"] = stem
        conf["compute_dtype"] = cdt
        return pipeline.PosePipeline(
            sp_params, gats_params, db, sp_config=conf,
            reproj_threshold=5.0, num_hypotheses=512, refine_iters=4)

    # baseline = the library-default fp32 polyphase path; the candidate
    # is whatever (stem, bf16, compute_dtype) combo the caller wants to
    # ship (compute_dtype="bfloat16" = the FULL conv encoder on the MXU
    # in bf16, not just the stem — VERDICT r4 Next #1b)
    pipe32 = make_pipe("float32", "polyphase")
    pipe16 = make_pipe("bfloat16", stem, compute_dtype)

    n = len(q_poses)
    images = np.stack([
        np.round(tcp.render(planes, p) * 255).astype(np.float32) / 255
        for p in q_poses])[..., None]
    Ks = np.broadcast_to(
        np.asarray(tcp.K_CAM, np.float32), (n, 3, 3)).copy()
    import jax

    keysA = jax.random.split(jax.random.PRNGKey(1000 + seed), n)
    keysB = jax.random.split(jax.random.PRNGKey(2000 + seed), n)

    out32A = pipe32(images, Ks, keysA)
    out32B = pipe32(images, Ks, keysB)   # solver noise floor
    out16A = pipe16(images, Ks, keysA)   # bf16 effect at equal keys

    def kpt_set(out, i):
        m = np.asarray(out.kpt_mask[i])
        return {tuple(np.round(k).astype(int))
                for k in np.asarray(out.keypoints2d[i])[m]}

    def match_set(out, i):
        return {(tuple(np.round(k).astype(int)), int(mi))
                for k, mi in zip(np.asarray(out.keypoints2d[i]),
                                 np.asarray(out.matches0[i])) if mi >= 0}

    for i in range(n):
        gt = q_poses[i][:3]
        a, b = kpt_set(out32A, i), kpt_set(out16A, i)
        results["kpt_jaccard"].append(len(a & b) / max(len(a | b), 1))
        ma, mb = match_set(out32A, i), match_set(out16A, i)
        results["match_jaccard"].append(
            len(ma & mb) / max(len(ma | mb), 1))
        p32A = np.asarray(out32A.poses[i])
        p32B = np.asarray(out32B.poses[i])
        p16A = np.asarray(out16A.poses[i])
        dr_bf, dt_bf = geo.query_pose_error(p16A, p32A)
        dr_nf, dt_nf = geo.query_pose_error(p32B, p32A)
        results["pose_dr_bf16"].append(float(dr_bf))
        results["pose_dt_bf16"].append(float(dt_bf))
        results["pose_dr_floor"].append(float(dr_nf))
        results["pose_dt_floor"].append(float(dt_nf))
        for name, pp in (("fp32", p32A), ("bf16", p16A),
                         ("floor", p32B)):
            r, t = geo.query_pose_error(pp, gt)
            for thr in THRESHOLDS:
                results[f"cmd{int(thr)}_{name}"].append(
                    bool(r < thr and t < thr))
    jax.clear_caches()


def main():
    # test_chain_parity imports tests/conftest, which pins JAX to CPU for
    # the suite. This gate must run on the real chip, so satisfy the
    # import with a minimal stand-in instead.
    import types

    fake = types.ModuleType("conftest")
    fake.reference_available = lambda: osp.isdir("/root/reference")
    sys.modules.setdefault("conftest", fake)

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--stem", default="polyphase",
                    choices=["polyphase", "direct"],
                    help="stem layout of the bf16 candidate under test "
                         "(baseline is always the fp32 polyphase default)")
    ap.add_argument("--compute-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="encoder compute dtype of the candidate: "
                         "'bfloat16' gates the FULL conv encoder in bf16 "
                         "(score/descriptor heads' softmax/normalization "
                         "stay fp32), on top of the bf16 stem")
    args = ap.parse_args()

    import test_chain_parity as tcp

    results = {k: [] for k in (
        "kpt_jaccard", "match_jaccard", "pose_dr_bf16", "pose_dt_bf16",
        "pose_dr_floor", "pose_dt_floor")}
    for thr in THRESHOLDS:
        for name in ("fp32", "bf16", "floor"):
            results[f"cmd{int(thr)}_{name}"] = []

    for seed in range(N_SEEDS):
        run_seed(tcp, seed, results, stem=args.stem,
                 compute_dtype=args.compute_dtype)
        print(f"[stem_dtype_gate] seed {seed} done", file=sys.stderr)

    def med(k):
        return float(np.median(results[k]))

    def q95(k):
        return float(np.percentile(results[k], 95))

    cmd = {}
    for thr in THRESHOLDS:
        for name in ("fp32", "bf16", "floor"):
            cmd[f"cmd{int(thr)}_{name}"] = float(
                np.mean(results[f"cmd{int(thr)}_{name}"]))
    # bucket flips vs fp32, elementwise
    flips_bf16 = sum(
        a != b
        for thr in THRESHOLDS
        for a, b in zip(results[f"cmd{int(thr)}_fp32"],
                        results[f"cmd{int(thr)}_bf16"]))
    flips_floor = sum(
        a != b
        for thr in THRESHOLDS
        for a, b in zip(results[f"cmd{int(thr)}_fp32"],
                        results[f"cmd{int(thr)}_floor"]))

    n_frames = len(results["kpt_jaccard"])
    verdict = (
        med("pose_dr_bf16") <= max(med("pose_dr_floor"), 0.05) * 2.0
        and q95("pose_dr_bf16") <= max(q95("pose_dr_floor"), 0.1) * 2.0
        and flips_bf16 <= max(flips_floor, 1)
        and med("match_jaccard") >= 0.95
    )
    print(json.dumps({
        "metric": "stem_dtype_bf16_gate",
        "frames": n_frames,
        "seeds": N_SEEDS,
        "kpt_jaccard_median": round(med("kpt_jaccard"), 4),
        "kpt_jaccard_min": round(float(np.min(results["kpt_jaccard"])), 4),
        "match_jaccard_median": round(med("match_jaccard"), 4),
        "match_jaccard_min": round(
            float(np.min(results["match_jaccard"])), 4),
        "pose_dr_bf16_med_p95": [round(med("pose_dr_bf16"), 4),
                                 round(q95("pose_dr_bf16"), 4)],
        "pose_dr_floor_med_p95": [round(med("pose_dr_floor"), 4),
                                  round(q95("pose_dr_floor"), 4)],
        "pose_dt_bf16_med_p95": [round(med("pose_dt_bf16"), 4),
                                 round(q95("pose_dt_bf16"), 4)],
        "pose_dt_floor_med_p95": [round(med("pose_dt_floor"), 4),
                                  round(q95("pose_dt_floor"), 4)],
        "cmd": cmd,
        "cmd_bucket_flips_bf16": flips_bf16,
        "cmd_bucket_flips_floor": flips_floor,
        "platform": os.environ.get("JAX_PLATFORMS", "(default)"),
        "stem": args.stem,
        "compute_dtype": args.compute_dtype,
        "verdict_flip_default": bool(verdict),
    }))


if __name__ == "__main__":
    main()
