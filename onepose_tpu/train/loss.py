"""Focal loss on the dual-softmax confidence matrix.

Behavioral reference: /root/reference/src/losses/focal_loss.py:13-25 — focal
BCE with separate positive/negative means. Reimplemented with masked
reductions (no boolean indexing → static shapes), plus an optional validity
mask the reference doesn't need (its pads are baked into the GT as negatives,
data_utils.py:208-230).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def focal_loss(conf_pred: jnp.ndarray, conf_gt: jnp.ndarray,
               alpha: float = 0.5, gamma: float = 2.0,
               pos_weight: float = 0.5, neg_weight: float = 0.5,
               valid_mask: Optional[jnp.ndarray] = None,
               eps: float = 1e-12) -> jnp.ndarray:
    """conf_pred: [..., N1, N2] in (0, 1); conf_gt: same shape, {0, 1}.

    Positive term: -alpha * (1-p)^gamma * log(p) averaged over GT matches;
    negative term: -(1-alpha) * p^gamma * log(1-p) averaged over GT
    non-matches; total = pos_weight * pos_mean + neg_weight * neg_mean.
    """
    conf_pred = jnp.clip(conf_pred.astype(jnp.float32), eps, 1.0 - eps)
    pos_mask = (conf_gt == 1)
    neg_mask = (conf_gt == 0)
    if valid_mask is not None:
        pos_mask &= valid_mask
        neg_mask &= valid_mask

    loss_pos = -alpha * (1.0 - conf_pred) ** gamma * jnp.log(conf_pred)
    loss_neg = -(1.0 - alpha) * conf_pred ** gamma * jnp.log1p(-conf_pred)

    n_pos = jnp.sum(pos_mask)
    n_neg = jnp.sum(neg_mask)
    pos_mean = jnp.sum(jnp.where(pos_mask, loss_pos, 0.0)) / jnp.maximum(
        n_pos, 1)
    neg_mean = jnp.sum(jnp.where(neg_mask, loss_neg, 0.0)) / jnp.maximum(
        n_neg, 1)
    # empty-set guards (focal_loss.py:17-22): drop a term when its set is
    # empty rather than produce NaN
    pos_term = jnp.where(n_pos > 0, pos_weight * pos_mean, 0.0)
    neg_term = jnp.where(n_neg > 0, neg_weight * neg_mean, 0.0)
    return pos_term + neg_term
