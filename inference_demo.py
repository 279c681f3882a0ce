#!/usr/bin/env python
"""Demo video inference: full frames → detection → pose → rendered box.

Public-surface equivalent of the reference's ``inference_demo.py``: frame 0
(or after tracking loss, < 8 PnP inliers) detects the object with the
feature-matching detector; subsequent frames crop by projecting the 3D box
with the previous pose; each crop runs SuperPoint → GATsSPG → on-device
RANSAC-EPnP; optionally a keyframe BA tracker refines the trajectory; every
frame is rendered with the estimated 3D box and assembled into
``demo_video.mp4``.

    python inference_demo.py +experiment=test_demo data_root=<root> data_seq=<seq>
"""
import glob
import os.path as osp
import sys

import numpy as np


def apply_tracking(tracker, db_keypoints3d, crop, K_crop, out, fi, pose):
    """Per-frame BA-tracking control flow; returns ``(pose_final, source)``.

    Reference control flow (/root/reference/inference_demo.py:253-299): the
    first frame seeds a keyframe and uses the PnP pose; every later frame is
    tracked (LK-flow/motion init → NN association → windowed BA) and
    keyframes are refreshed each ``frame_interval``, gated on pose jumps.
    Tracker failure falls back to the PnP pose.

    ``out`` is a batch-1 :class:`onepose_tpu.pipeline.PoseOutput`.
    """
    kpts = np.asarray(out.keypoints2d)[0]
    descs = np.asarray(out.descriptors2d)[0]
    kmask = np.asarray(out.kpt_mask)[0]
    m0 = np.asarray(out.matches0)[0]
    matched = np.where((m0 >= 0) & kmask)[0]

    def _add_kf():
        if pose is None or len(matched) < 8:
            return False
        return tracker.add_keyframe(
            crop, kpts, descs, kmask, pose, K_crop,
            mkpts3d=db_keypoints3d[m0[matched]], kpt_indices=matched)

    if not tracker.frames:
        _add_kf()
        return pose, "pnp"
    tracked, tinfo = tracker.track(crop, kpts, descs, kmask, K_crop)
    if fi % tracker.frame_interval == 0:
        _add_kf()
    if tracked is None:
        return pose, "pnp"
    return tracked, f"track:{tinfo['mode']}"


def inference_core(cfg):
    import jax

    from onepose_tpu import detector as detector_mod, pipeline
    from onepose_tpu.datasets import anno
    from onepose_tpu.models import superpoint
    from onepose_tpu.sfm.extract import load_gray
    from onepose_tpu.sfm import extract as extract_mod
    from onepose_tpu.tracker import BATracker
    from onepose_tpu.utils import geometry as geo, model_io, path_utils, \
        vis_utils

    gats_params = model_io.load_gats_params(cfg.model.onepose_model_path)
    sp_params = model_io.load_superpoint_params(
        cfg.model.extractor_model_path)
    sg_params = model_io.load_superglue_params(
        cfg.model.matching_model_path)

    data_root = cfg.data_root
    seq_dir = osp.join(data_root, cfg.data_seq)
    obj_name = data_root.rstrip("/").split("/")[-1]
    sfm_model_dir = osp.join(cfg.sfm_model_dir, obj_name)

    anno_dir = path_utils.get_anno_dir(
        sfm_model_dir, cfg.network.detection, cfg.network.matching)
    db = anno.load_object_db(
        osp.join(anno_dir, "anno_3d_average.npz"),
        osp.join(anno_dir, "anno_3d_collect.npz"),
        osp.join(anno_dir, "idxs.npy"),
        num_leaf=cfg.num_leaf, shape3d=cfg.shape3d)
    box3d = np.loadtxt(path_utils.get_3d_box_path(data_root))
    K_full, _ = geo.get_K(path_utils.get_intrin_full_path(seq_dir))

    import feature_matching_object_detector as fmod

    db_paths = fmod.sample_ref_views(
        sfm_model_dir, cfg.network.detection, cfg.network.matching,
        cfg.n_ref_view)
    det = detector_mod.LocalFeatureObjectDetector(
        sp_params, sg_params, [load_gray(p) for p in db_paths],
        max_keypoints=cfg.max_keypoints)

    # Same extract-conf base as the reference's load_extractor_model
    # (/root/reference/inference_demo.py:88-98): nms_radius 3.
    sp_conf = dict(extract_mod.CONFS[cfg.network.detection]["conf"])
    sp_conf["max_keypoints"] = cfg.max_keypoints
    # bf16 direct stem default (gate-validated; see inference.py /
    # DESIGN §6d)
    sp_conf["stem_dtype"] = str(cfg.get("stem_dtype", "bfloat16"))
    sp_conf["stem"] = str(cfg.get(
        "stem",
        "direct" if sp_conf["stem_dtype"] == "bfloat16" else "polyphase"))
    # full-encoder bf16, gate-validated (see inference.py / DESIGN §6e)
    sp_conf["compute_dtype"] = str(cfg.get(
        "compute_dtype",
        "bfloat16" if sp_conf["stem_dtype"] == "bfloat16" else "float32"))
    pipe = pipeline.PosePipeline(
        sp_params, gats_params, db,
        sp_config=sp_conf,
        reproj_threshold=cfg.pnp.reproj_threshold,
        num_hypotheses=cfg.pnp.num_hypotheses,
        refine_iters=cfg.pnp.refine_iters)

    tracker = BATracker() if cfg.use_tracking else None

    frames = sorted(
        glob.glob(osp.join(seq_dir, "color_full", "*.png")),
        key=lambda p: int(osp.splitext(osp.basename(p))[0]))
    key = jax.random.PRNGKey(12345)
    pose_prev = None
    frame_dir = osp.join(cfg.output.demo_dir, "frames")
    pose_log = []
    import cv2

    for fi, p in enumerate(frames):
        full = load_gray(p)
        if pose_prev is None:
            res = det.detect(full, K_full)
        else:
            res = det.previous_pose_detect(full, K_full, pose_prev, box3d)

        key, sub = jax.random.split(key)
        out = pipe(res.crop[None, :, :, None], res.K_crop[None],
                   jax.random.split(sub, 1))
        success = bool(np.asarray(out.success)[0])
        n_inliers = int(np.asarray(out.num_inliers)[0])
        pose = np.asarray(out.poses)[0] if success else None
        pose_final, source = pose, "pnp"

        if tracker is not None:
            pose_final, source = apply_tracking(
                tracker, db.keypoints3d, res.crop, res.K_crop, out, fi,
                pose)

        # fall back to full detection when PnP consensus is weak
        pose_prev = pose if (success and n_inliers >= 8) else None
        pose_log.append({
            "frame": osp.basename(p), "source": source,
            "inliers": n_inliers,
            "pose": None if pose_final is None else pose_final.tolist()})

        img_bgr = cv2.imread(p)
        vis_utils.save_demo_image(
            pose_final, K_full, img_bgr, box3d,
            draw_box=pose_final is not None,
            save_path=osp.join(frame_dir, osp.basename(p)))
        if fi % 20 == 0:
            print(f"[demo] frame {fi}/{len(frames)} "
                  f"inliers={n_inliers} success={success} source={source}")

    import json

    with open(osp.join(cfg.output.demo_dir, "poses.json"), "w") as f:
        json.dump(pose_log, f)

    video = vis_utils.make_video(
        frame_dir, osp.join(cfg.output.demo_dir, "demo_video.mp4"))
    print(f"[demo] wrote {video}")


def main():
    from onepose_tpu.config import load_config
    from onepose_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()  # restart economics: DESIGN §11

    cfg = load_config(sys.argv[1:])
    {"inference_demo": inference_core}[cfg.type](cfg)


if __name__ == "__main__":
    main()
