"""Pose-metric evaluator: 1/3/5 cm-degree recall accumulation
(behavioral contract of /root/reference/src/evaluators/cmd_evaluator.py)."""
from __future__ import annotations

import numpy as np

from onepose_tpu.utils.geometry import query_pose_error


class Evaluator:
    def __init__(self, thresholds=(1, 3, 5)):
        self.thresholds = thresholds
        self.reset()

    def reset(self):
        self.records = {t: [] for t in self.thresholds}
        self.R_errs = []
        self.t_errs = []

    def evaluate(self, pose_pred, pose_gt):
        if pose_pred is None:
            for t in self.thresholds:
                self.records[t].append(False)
            self.R_errs.append(np.inf)
            self.t_errs.append(np.inf)
            return
        pose_pred = np.asarray(pose_pred)[:3, :4]
        pose_gt = np.asarray(pose_gt)[:3, :4]
        r_err, t_err = query_pose_error(pose_pred, pose_gt)
        self.R_errs.append(r_err)
        self.t_errs.append(t_err)
        for t in self.thresholds:
            self.records[t].append(bool(r_err < t and t_err < t))

    def summarize(self, verbose: bool = True) -> dict:
        out = {}
        for t in self.thresholds:
            val = float(np.mean(self.records[t])) if self.records[t] else 0.0
            out[f"cmd{t}"] = val
            if verbose:
                print(f"{t} cm {t} degree metric: {val}")
        self.reset()
        return out


def add_metric(pose_pred, pose_gt, model_points, symmetric: bool = False):
    """ADD / ADD-S: mean distance between model points transformed by the
    predicted vs GT pose (the reference's Evaluator reserves an `add` slot,
    cmd_evaluator.py:9, but never implements it; standard definition here).

    model_points: [N, 3] object-frame points (e.g. the SfM cloud or box
    corners). symmetric=True uses nearest-neighbour distances (ADD-S).
    """
    pose_pred = np.asarray(pose_pred)[:3, :4]
    pose_gt = np.asarray(pose_gt)[:3, :4]
    pts = np.asarray(model_points)
    p_pred = pts @ pose_pred[:3, :3].T + pose_pred[:3, 3]
    p_gt = pts @ pose_gt[:3, :3].T + pose_gt[:3, 3]
    if symmetric:
        d = np.linalg.norm(
            p_pred[:, None, :] - p_gt[None, :, :], axis=-1).min(axis=1)
    else:
        d = np.linalg.norm(p_pred - p_gt, axis=-1)
    return float(d.mean())


def record_eval_result(out_dir: str, obj_name: str, seq_name: str,
                       eval_result: dict):
    """Write the per-sequence eval report (eval_utils.py:7-15 format)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, obj_name + seq_name + ".txt")
    with open(path, "w") as f:
        for k, v in eval_result.items():
            f.write(f"{k}: {v}\n")
