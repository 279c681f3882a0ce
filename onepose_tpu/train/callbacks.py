"""Training/validation callbacks: model watching and classification
heatmaps.

Capability match for the reference's optional wandb callbacks
(/root/reference/src/callbacks/wandb_callbacks.py:80-186 — WatchModelWithWandb,
LogF1PrecisionRecallHeatmapToWandb, LogConfusionMatrixToWandb; unwired in the
reference's default train config). TPU-native framing: the "model watch"
logs per-layer parameter/gradient norms from the jitted step's pytree (no
hooks — functional params are already explicit), and the heatmap callbacks
accumulate (pred, target) labels across validation batches and emit
f1/precision/recall + a confusion matrix as logger scalars, a PNG heatmap,
and a wandb HeatMap when wandb is importable.
"""
from __future__ import annotations

import os
import os.path as osp
from typing import Dict, List, Optional, Sequence

import numpy as np


def param_norms(tree, prefix: str = "params") -> Dict[str, float]:
    """Per-top-level-module L2 norms of a pytree — the WatchModelWithWandb
    equivalent (wandb.watch logs param/grad histograms per module; norms
    are the scalar-logger analogue)."""
    import jax

    out: Dict[str, float] = {}
    if isinstance(tree, dict):
        for k, sub in tree.items():
            leaves = jax.tree.leaves(sub)
            if leaves:
                sq = sum(float(np.sum(np.square(np.asarray(x))))
                         for x in leaves)
                out[f"{prefix}_norm/{k}"] = float(np.sqrt(sq))
    else:
        leaves = jax.tree.leaves(tree)
        sq = sum(float(np.sum(np.square(np.asarray(x)))) for x in leaves)
        out[f"{prefix}_norm/all"] = float(np.sqrt(sq))
    return out


class ModelWatcher:
    """Log per-module parameter (and optional gradient) norms every
    ``log_freq`` steps. Role of WatchModelWithWandb
    (wandb_callbacks.py:67-82)."""

    def __init__(self, logger, log_freq: int = 100):
        self.logger = logger
        self.log_freq = max(int(log_freq), 1)

    def step(self, step: int, params, grads=None):
        if step % self.log_freq != 0:
            return
        metrics = param_norms(params, "params")
        if grads is not None:
            metrics.update(param_norms(grads, "grads"))
        if self.logger is not None:
            self.logger.log(step, metrics)
        return metrics


class ClassificationHeatmaps:
    """Accumulate predicted/target class labels over validation batches,
    then emit f1 / precision / recall per class and the confusion matrix.

    Roles of LogF1PrecisionRecallHeatmapToWandb (wandb_callbacks.py:85-137)
    and LogConfusionMatrixToWandb (:140-186) in one accumulator (both
    reference callbacks gather the same (preds, targets) stream).
    """

    def __init__(self, class_names: Sequence[str]):
        self.class_names = list(class_names)
        self.preds: List[np.ndarray] = []
        self.targets: List[np.ndarray] = []

    def update(self, preds, targets):
        preds = np.asarray(preds).reshape(-1)
        targets = np.asarray(targets).reshape(-1)
        if preds.shape != targets.shape:
            raise ValueError(f"preds {preds.shape} != targets "
                             f"{targets.shape}")
        self.preds.append(preds.astype(np.int64))
        self.targets.append(targets.astype(np.int64))

    def confusion_matrix(self) -> np.ndarray:
        """[C, C] counts; rows = target class, cols = predicted class."""
        c = len(self.class_names)
        cm = np.zeros((c, c), np.int64)
        if self.preds:
            p = np.concatenate(self.preds)
            t = np.concatenate(self.targets)
            np.add.at(cm, (t, p), 1)
        return cm

    def scores(self) -> Dict[str, np.ndarray]:
        """Per-class f1/precision/recall from the confusion matrix
        (average=None semantics of the reference's sklearn calls)."""
        cm = self.confusion_matrix()
        tp = np.diag(cm).astype(np.float64)
        pred_tot = cm.sum(axis=0).astype(np.float64)
        targ_tot = cm.sum(axis=1).astype(np.float64)
        precision = np.divide(tp, pred_tot, out=np.zeros_like(tp),
                              where=pred_tot > 0)
        recall = np.divide(tp, targ_tot, out=np.zeros_like(tp),
                           where=targ_tot > 0)
        denom = precision + recall
        f1 = np.divide(2 * precision * recall, denom,
                       out=np.zeros_like(tp), where=denom > 0)
        return {"f1": f1, "precision": precision, "recall": recall,
                "confusion": cm}

    def emit(self, logger=None, step: int = 0, epoch: int = 0,
             plot_dir: Optional[str] = None) -> Dict[str, float]:
        """Compute, log scalars, save the heatmap PNG, mirror to wandb.
        Returns the flat scalar metrics. Resets the accumulators (the
        reference callbacks clear state at validation_epoch_end)."""
        s = self.scores()
        flat: Dict[str, float] = {}
        for metric in ("f1", "precision", "recall"):
            for ci, name in enumerate(self.class_names):
                flat[f"val_{metric}/{name}"] = float(s[metric][ci])
        if logger is not None:
            logger.log(step, flat)
            wandb_run = getattr(getattr(logger, "wandb", None), "run", None)
            if wandb_run is not None:
                import wandb

                wandb_run.log({
                    f"f1_p_r_heatmap/{epoch}": wandb.plots.HeatMap(
                        x_labels=self.class_names,
                        y_labels=["f1", "precision", "recall"],
                        matrix_values=[s["f1"].tolist(),
                                       s["precision"].tolist(),
                                       s["recall"].tolist()],
                        show_text=True),
                    f"confusion_matrix/{epoch}": wandb.plot.confusion_matrix(
                        preds=np.concatenate(self.preds).tolist(),
                        y_true=np.concatenate(self.targets).tolist(),
                        class_names=self.class_names),
                }, commit=False)
        if plot_dir is not None:
            self._save_png(s, epoch, plot_dir)
        self.preds, self.targets = [], []
        return flat

    def _save_png(self, s, epoch: int, plot_dir: str):
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return
        os.makedirs(plot_dir, exist_ok=True)
        fig, axes = plt.subplots(1, 2, figsize=(11, 4))
        m = np.stack([s["f1"], s["precision"], s["recall"]])
        im0 = axes[0].imshow(m, vmin=0, vmax=1, cmap="viridis")
        axes[0].set_yticks(range(3), ["f1", "precision", "recall"])
        axes[0].set_xticks(range(len(self.class_names)), self.class_names,
                           rotation=45, ha="right")
        for (i, j), v in np.ndenumerate(m):
            axes[0].text(j, i, f"{v:.2f}", ha="center", va="center",
                         color="w", fontsize=8)
        fig.colorbar(im0, ax=axes[0])
        axes[0].set_title("f1 / precision / recall")
        cm = s["confusion"]
        im1 = axes[1].imshow(cm, cmap="viridis")
        axes[1].set_xticks(range(len(self.class_names)), self.class_names,
                           rotation=45, ha="right")
        axes[1].set_yticks(range(len(self.class_names)), self.class_names)
        for (i, j), v in np.ndenumerate(cm):
            axes[1].text(j, i, str(v), ha="center", va="center",
                         color="w", fontsize=8)
        fig.colorbar(im1, ax=axes[1])
        axes[1].set_title("confusion (rows=target)")
        fig.tight_layout()
        fig.savefig(osp.join(plot_dir, f"heatmaps_epoch{epoch}.png"),
                    dpi=110)
        plt.close(fig)


def match_classification_labels(matches0, kpt_mask, kpts2d, gt_proj,
                                valid3d, thresh_px: float = 5.0):
    """Map the matcher's per-keypoint predictions to 3-class labels for the
    heatmap callbacks, using GT-pose reprojection as ground truth (live
    SuperPoint keypoints carry no index-level GT assignment):

    - pred:   0 = unmatched, 1 = matched and the matched 3D point
              reprojects within ``thresh_px`` of the keypoint, 2 = matched
              but reprojects farther (wrong match);
    - target: 1 if ANY valid 3D point reprojects within ``thresh_px``
              (the keypoint is matchable), else 0.

    matches0/kpt_mask: [K]; kpts2d: [K, 2]; gt_proj: [P, 2] DB points
    reprojected by the GT pose; valid3d: [P]. Returns (preds, targets)
    over valid keypoints only.
    """
    matches0 = np.asarray(matches0)
    kpt_mask = np.asarray(kpt_mask).astype(bool)
    kpts2d = np.asarray(kpts2d, np.float64)
    gt_proj = np.asarray(gt_proj, np.float64)
    valid3d = np.asarray(valid3d).astype(bool)

    d_all = np.linalg.norm(
        kpts2d[:, None, :] - gt_proj[None, :, :], axis=-1)  # [K, P]
    d_all[:, ~valid3d] = np.inf
    targ = (d_all.min(axis=1) < thresh_px).astype(np.int64)

    m_clip = np.clip(matches0, 0, len(gt_proj) - 1)
    d_match = np.linalg.norm(kpts2d - gt_proj[m_clip], axis=-1)
    pred = np.where(matches0 < 0, 0,
                    np.where(d_match < thresh_px, 1, 2)).astype(np.int64)
    return pred[kpt_mask], targ[kpt_mask]


MATCH_CLASS_NAMES = ("unmatched", "match_correct", "match_wrong")


def unfreeze_after(wait_steps: int, frozen_mask) -> "optax.GradientTransformation":  # noqa: F821
    """Freeze part of the model for the first ``wait_steps`` optimizer steps.

    Role of the reference's UnfreezeModelCallback
    (/root/reference/src/callbacks/custom_callbacks.py:18-29 — flips
    ``requires_grad`` on every parameter after ``wait_epochs``). JAX has no
    requires_grad; the idiomatic equivalent is an optax transformation that
    zeroes the *updates* of frozen leaves until the step counter passes the
    threshold — jit-stable (the gate is a traced ``where``, no retrace at
    the unfreeze boundary) and composable in the optimizer chain. Place it
    BEFORE the inner optimizer so frozen leaves feed zero gradients into
    Adam/momentum — matching the reference's ``requires_grad=False``, which
    produces zero optimizer state during the frozen phase:

        tx = optax.chain(callbacks.unfreeze_after(5 * steps_per_epoch, mask),
                         trainer.make_optimizer(...))

    Placing it *after* the optimizer also freezes the params, but the inner
    optimizer then still accumulates momentum/second-moment state for frozen
    leaves, and they get a stale-momentum kick at the unfreeze boundary —
    a documented divergence from the reference if you choose that order.

    ``frozen_mask``: a pytree prefix of the params with True at leaves to
    freeze (a bool at an internal node freezes that whole subtree), or a
    callable(params)->mask pytree (optax.masked convention). Callers
    convert epochs → steps, as with multistep_schedule.
    """
    import jax
    import jax.numpy as jnp
    import optax

    def _broadcast_prefix(mask, updates):
        """Expand a pytree-prefix mask to the full structure of updates.

        jax.tree.map(f, updates, mask) requires mask to match updates'
        structure exactly; a genuinely shallower prefix (True at a subtree
        node) would raise. Flatten updates up to the mask's depth, gate each
        subtree with its (scalar) mask leaf, and reassemble.
        """
        mask_leaves, mask_def = jax.tree.flatten(mask)
        subtrees = mask_def.flatten_up_to(updates)
        return mask_leaves, subtrees, mask_def

    def init(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        del params
        mask = frozen_mask(updates) if callable(frozen_mask) else frozen_mask
        live = state.count >= wait_steps

        def gate(u, m):
            return jnp.where(
                jnp.logical_or(live, jnp.logical_not(m)), u,
                jnp.zeros_like(u))

        mask_leaves, subtrees, mask_def = _broadcast_prefix(mask, updates)
        gated = [jax.tree.map(lambda u, m=m: gate(u, m), sub)
                 for m, sub in zip(mask_leaves, subtrees)]
        new = jax.tree.unflatten(mask_def, gated)
        return new, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init, update)
