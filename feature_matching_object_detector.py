#!/usr/bin/env python
"""Standalone feature-matching 2D object detection over full frames.

Public-surface equivalent of the reference's
``feature_matching_object_detector.py``: for each test sequence, detect the
object in every ``color_full`` frame by SuperGlue-matching against sampled
reference views, write 512x512 crops to ``color_det/`` and cropped
intrinsics to ``intrin_det/`` — consumed by ``inference.py`` with
``object_detect_mode=feature_matching``.

    python feature_matching_object_detector.py +experiment=object_detector
"""
import glob
import os
import os.path as osp
import sys

import numpy as np


def _read_list(path):
    with open(path, "r") as f:
        return [line.strip() for line in f if line.strip()]


def sample_ref_views(sfm_model_dir, detection, matching, n_ref_view):
    """Sample n_ref_view database image paths from the SfM workspace
    (reference local_feature_2D_detector.py:52-74)."""
    from onepose_tpu.utils import colmap_io

    model_dir = osp.join(
        sfm_model_dir, f"outputs_{detection}_{matching}", "sfm_ws", "model")
    _, images, _ = colmap_io.read_model(model_dir)
    ids = sorted(images.keys())
    gap = max(len(ids) // n_ref_view, 1)
    return [images[ids[i]].name for i in range(0, len(ids), gap)]


def detect_sequence(cfg, seq_dir, sfm_model_dir, sp_params, sg_params):
    import cv2

    from onepose_tpu.detector import LocalFeatureObjectDetector
    from onepose_tpu.sfm.extract import load_gray
    from onepose_tpu.utils import geometry as geo

    db_paths = sample_ref_views(
        sfm_model_dir, cfg.network.detection, cfg.network.matching,
        cfg.n_ref_view)
    db_images = [load_gray(p) for p in db_paths]
    detector = LocalFeatureObjectDetector(
        sp_params, sg_params, db_images,
        max_keypoints=cfg.max_keypoints)

    K, _ = geo.get_K(osp.join(seq_dir, "intrinsics.txt"))
    out_color = osp.join(seq_dir, "color_det")
    out_intrin = osp.join(seq_dir, "intrin_det")
    os.makedirs(out_color, exist_ok=True)
    os.makedirs(out_intrin, exist_ok=True)

    frames = sorted(
        glob.glob(osp.join(seq_dir, "color_full", "*.png")),
        key=lambda p: int(osp.splitext(osp.basename(p))[0]))
    for p in frames:
        img = load_gray(p)
        res = detector.detect(img, K)
        name = osp.basename(p)
        cv2.imwrite(osp.join(out_color, name),
                    (res.crop * 255).astype(np.uint8))
        np.savetxt(osp.join(out_intrin, name.replace(".png", ".txt")),
                   res.K_crop)
    print(f"[detector] {seq_dir}: {len(frames)} frames → {out_color}")


def detection(cfg):
    from onepose_tpu.utils import model_io

    sp_params = model_io.load_superpoint_params(
        cfg.model.extractor_model_path)
    sg_params = model_io.load_superglue_params(
        cfg.model.matching_model_path)

    data_entries = _read_list(cfg.input.data_list)
    sfm_entries = _read_list(cfg.input.sfm_list)
    for entry, sfm_name in zip(data_entries, sfm_entries):
        parts = entry.split(" ")
        obj_dir, seqs = parts[0], parts[1:]
        for seq in seqs:
            seq_dir = osp.join(cfg.scan_data_dir, obj_dir, seq)
            sfm_model_dir = osp.join(cfg.sfm_model_dir, sfm_name)
            detect_sequence(cfg, seq_dir, sfm_model_dir, sp_params,
                            sg_params)


def main():
    from onepose_tpu.config import load_config

    cfg = load_config(sys.argv[1:])
    {"detection": detection}[cfg.type](cfg)


if __name__ == "__main__":
    main()
