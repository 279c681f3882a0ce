"""Mutual nearest-neighbour descriptor matcher.

Behavioral reference: /root/reference/src/models/matchers/nn/
nearest_neighbour.py — cosine-similarity mutual NN with optional ratio and
distance thresholds; used by the BA tracker for keyframe↔query matching.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class NNMatchResult(NamedTuple):
    matches0: jnp.ndarray          # [N0] index into set 1, -1 invalid
    matching_scores0: jnp.ndarray  # [N0] cosine similarity


@functools.partial(
    jax.jit, static_argnames=("ratio_thresh", "distance_thresh"))
def mutual_nearest_neighbour(desc0: jnp.ndarray, desc1: jnp.ndarray,
                             mask0: Optional[jnp.ndarray] = None,
                             mask1: Optional[jnp.ndarray] = None,
                             ratio_thresh: float = 0.0,
                             distance_thresh: float = 0.0
                             ) -> NNMatchResult:
    """desc0: [N0, D], desc1: [N1, D] (L2-normalized or not — normalized
    internally). ratio_thresh: Lowe ratio on (1 - sim); distance_thresh:
    minimum cosine similarity. 0 disables either test."""
    d0 = desc0 / jnp.maximum(
        jnp.linalg.norm(desc0, axis=1, keepdims=True), 1e-12)
    d1 = desc1 / jnp.maximum(
        jnp.linalg.norm(desc1, axis=1, keepdims=True), 1e-12)
    sim = d0 @ d1.T  # [N0, N1]
    if mask0 is not None:
        sim = jnp.where(mask0[:, None], sim, -2.0)
    if mask1 is not None:
        sim = jnp.where(mask1[None, :], sim, -2.0)

    idx0 = jnp.argmax(sim, axis=1)
    idx1 = jnp.argmax(sim, axis=0)
    best0 = jnp.max(sim, axis=1)
    mutual = jnp.arange(sim.shape[0]) == idx1[idx0]
    valid = mutual

    if ratio_thresh > 0:
        # second-best similarity per row
        sim_wo_best = sim.at[jnp.arange(sim.shape[0]), idx0].set(-2.0)
        second = jnp.max(sim_wo_best, axis=1)
        valid &= (1.0 - best0) < ratio_thresh * (1.0 - second)
    if distance_thresh > 0:
        valid &= best0 > distance_thresh

    matches0 = jnp.where(valid, idx0, -1).astype(jnp.int32)
    scores0 = jnp.where(valid, best0, 0.0)
    return NNMatchResult(matches0, scores0)
