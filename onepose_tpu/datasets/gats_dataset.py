"""Training/validation dataset for the GATsSPG matcher.

Behavioral reference: /root/reference/src/datasets/GATs_spg_dataset.py +
data_utils padding (:60-230): per item, the 2D annotation (keypoints /
descriptors / scores / GT assign matrix) padded to ``shape2d`` with random
keypoints + dustbin descriptors, the 3D annotation padded to ``shape3d``,
``num_leaf`` leaf descriptors resampled per access (train-time
augmentation), and the GT confidence matrix with pads as negatives.

No torch / pycocotools: the merged ``train.json`` index is a plain dict
(images + annotations), items are numpy, batching is a thin shuffled
iterator feeding jnp batches.
"""
from __future__ import annotations

import json
import os.path as osp
from typing import Dict, Iterator, List, Optional

import numpy as np

from onepose_tpu.datasets import anno as anno_mod


def load_anno_index(anno_file: str):
    """Load the merged annotation index {'images': [...],
    'annotations': [...]} (run.py merge_anno format, reference run.py:40-77),
    joined on image_id."""
    with open(anno_file, "r") as f:
        data = json.load(f)
    img_by_id = {im["id"]: im for im in data["images"]}
    items = []
    for ann in data["annotations"]:
        im = img_by_id[ann["image_id"]]
        items.append({**ann, "img_file": im["img_file"]})
    return items


def pad_keypoints2d_random(kpts, descs, scores, img_h, img_w, target,
                           rng: np.random.Generator):
    """Pad with random integer pixel positions (dustbin descriptor = ones,
    score = 0), or truncate (reference data_utils.py:60-82)."""
    n = kpts.shape[0]
    dim = descs.shape[1]
    if n >= target:
        return kpts[:target], descs[:target], scores[:target]
    n_pad = target - n
    rand_xy = np.stack([
        rng.integers(0, img_w, n_pad),
        rng.integers(0, img_h, n_pad),
    ], axis=1).astype(kpts.dtype)
    kpts = np.concatenate([kpts, rand_xy])
    descs = np.concatenate([descs, np.ones((n_pad, dim), descs.dtype)])
    scores = np.concatenate([scores, np.zeros(n_pad, scores.dtype)])
    return kpts, descs, scores


def pad_keypoints3d_random(kpts, target, rng: np.random.Generator):
    """Pad with zero-mean uniform random points (data_utils.py:120-140)."""
    n = kpts.shape[0]
    if n >= target:
        return kpts[:target]
    n_pad = target - n
    rand = (rng.random((n_pad, 3)) - 0.5).astype(kpts.dtype)
    return np.concatenate([kpts, rand])


def reshape_assign_matrix(assign, num2d, num3d, shape2d, shape3d,
                          pad_val=0):
    """[2, k] index pairs → dense [shape2d, shape3d] GT confidence matrix;
    rows/cols beyond the real counts set to ``pad_val``
    (data_utils.py:208-230)."""
    conf = np.zeros((shape2d, shape3d), np.int32)
    if assign.size:
        valid = (assign[0] < shape2d) & (assign[1] < shape3d)
        a = assign[:, valid].astype(np.int64)
        conf[a[0], a[1]] = 1
    conf[min(num2d, shape2d):] = pad_val
    conf[:, min(num3d, shape3d):] = pad_val
    return conf


class GATsSPGDataset:
    def __init__(self, anno_file: str, num_leaf: int = 8,
                 split: str = "train", shape2d: int = 1000,
                 shape3d: int = 2000, pad_val: int = 0,
                 load_pose_gt: bool = False, seed: int = 12345):
        self.items = load_anno_index(anno_file)
        self.num_leaf = num_leaf
        self.split = split
        self.shape2d = shape2d
        self.shape3d = shape3d
        self.pad_val = pad_val
        self.load_pose_gt = load_pose_gt
        self.rng = np.random.default_rng(seed)
        self._anno3d_cache: Dict[str, dict] = {}

    def __len__(self):
        return len(self.items)

    # ------------------------------------------------------------------
    def _read_anno3d(self, ann, rng):
        """3D side: padded keypoints/avg descriptors + resampled leaves."""
        avg = np.load(ann["avg_anno3d_file"])
        clt = np.load(ann["collect_anno3d_file"])
        idxs = np.load(ann["idxs_file"])

        kpts3d = np.asarray(clt["keypoints3d"], np.float32)
        num3d = kpts3d.shape[0]
        avg_desc = np.asarray(avg["descriptors3d"], np.float32).T  # [m, D]
        dim = avg_desc.shape[1]

        leaf_desc, leaf_scores = anno_mod.build_leaves(
            clt["descriptors3d"], clt["scores3d"], idxs, self.num_leaf,
            rng)

        # pad to shape3d
        kpts3d = pad_keypoints3d_random(kpts3d, self.shape3d, rng)
        if num3d >= self.shape3d:
            avg_desc = avg_desc[: self.shape3d]
            leaf_desc = leaf_desc[: self.shape3d * self.num_leaf]
        else:
            n_pad = self.shape3d - num3d
            avg_desc = np.concatenate(
                [avg_desc, np.ones((n_pad, dim), np.float32)])
            leaf_desc = np.concatenate(
                [leaf_desc,
                 np.ones((n_pad * self.num_leaf, dim), np.float32)])
        return kpts3d, avg_desc, leaf_desc, num3d

    def get(self, index: int, rng: Optional[np.random.Generator] = None):
        rng = rng or self.rng
        ann = self.items[index]
        kpts3d, avg_desc, leaf_desc, num3d = self._read_anno3d(ann, rng)

        item = {
            "keypoints3d": kpts3d,
            "descriptors3d_db": avg_desc,
            "descriptors2d_db": leaf_desc,
        }

        if self.split == "train":
            with open(ann["anno2d_file"], "r") as f:
                a2d = json.load(f)
            kpts2d = np.asarray(a2d["keypoints2d"], np.float32)
            desc2d = np.asarray(a2d["descriptors2d"], np.float32).T
            scores2d = np.asarray(
                a2d["scores2d"], np.float32).reshape(-1)
            assign = np.asarray(a2d["assign_matrix"], np.int64)
            num2d = kpts2d.shape[0]

            # image size for random pad positions; 512 crops by contract
            kpts2d, desc2d, scores2d = pad_keypoints2d_random(
                kpts2d, desc2d, scores2d, 512, 512, self.shape2d, rng)
            conf_gt = reshape_assign_matrix(
                assign, num2d, num3d, self.shape2d, self.shape3d,
                self.pad_val)
            item.update({
                "keypoints2d": kpts2d,
                "descriptors2d_query": desc2d,
                "scores2d_query": scores2d,
                "conf_gt": conf_gt,
            })
        else:
            from onepose_tpu.sfm.extract import load_gray

            item["image"] = load_gray(ann["img_file"])

        if self.load_pose_gt:
            from onepose_tpu.utils import path_utils

            color = ann["img_file"]
            item["query_intrinsic"] = np.loadtxt(
                path_utils.get_intrin_path_by_color(color)).astype(
                    np.float32)
            item["query_pose_gt"] = np.loadtxt(
                ann["pose_file"]).astype(np.float32)
        return item

    def get_query(self, index: int):
        """Query-side only (image + GT intrinsics/pose) — for batched
        validation where the object DB is built once per object instead of
        re-read per item."""
        from onepose_tpu.sfm.extract import load_gray
        from onepose_tpu.utils import path_utils

        ann = self.items[index]
        item = {"image": load_gray(ann["img_file"])}
        color = ann["img_file"]
        item["query_intrinsic"] = np.loadtxt(
            path_utils.get_intrin_path_by_color(color)).astype(np.float32)
        item["query_pose_gt"] = np.loadtxt(
            ann["pose_file"]).astype(np.float32)
        return item

    # ------------------------------------------------------------------
    def batches(self, batch_size: int, shuffle: bool = True,
                drop_last: bool = True,
                seed: Optional[int] = None) -> Iterator[Dict]:
        """Yield collated numpy batches."""
        order = np.arange(len(self))
        rng = np.random.default_rng(seed if seed is not None else 0)
        if shuffle:
            rng.shuffle(order)
        for start in range(0, len(order), batch_size):
            idx = order[start:start + batch_size]
            if drop_last and len(idx) < batch_size:
                break
            items = [self.get(int(i), rng) for i in idx]
            yield {
                k: np.stack([it[k] for it in items])
                for k in items[0]
            }
