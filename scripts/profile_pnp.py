#!/usr/bin/env python
"""PnP sub-stage profile: where the RANSAC stage's ms actually go.

Times CUMULATIVE prefixes of ``ops/epnp.py::ransac_pnp`` (via its
``profile_prefix`` hook) under the r3 chained-scalar protocol
(docs/DESIGN.md §8), at the fused pipeline's PnP shapes (batch 8,
N=1024 correspondences, 512 hypotheses, LO 64, refine 5). Prefix deltas
are in-context — each stage is timed with everything before it present,
so fusion/layout effects are included — and sum to the full stage cost.

Stages:
  solve   minimal-solver hypotheses (P3P quartics + planar-H + P6P DLT)
  score   + MSAC scoring of all hypotheses + top-K
  lo      + LO-RANSAC non-minimal round (64 8-point refits + scoring)
  refit   + per-candidate refit→rescore chains (EPnP/planar + 1-step GN)
  full    + winner's full GN polish + final scoring
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onepose_tpu.utils.chipbench import chain_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from onepose_tpu.ops import epnp

    rng = np.random.default_rng(0)
    B, N = 8, 1024

    # realistic match geometry: ~35% inliers of a true pose, rest clutter
    k3 = rng.uniform(-0.1, 0.1, (B, N, 3)).astype(np.float32)
    Rt = np.concatenate([np.eye(3), [[0], [0], [0.6]]], axis=1)
    cam = k3 @ Rt[:, :3].T + Rt[:, 3]
    uv = cam[..., :2] / cam[..., 2:]
    px = uv * 460.0 + 256.0
    outl = rng.uniform(0, 512, (B, N, 2)).astype(np.float32)
    is_in = rng.uniform(size=(B, N)) < 0.35
    k2 = np.where(is_in[..., None], px, outl).astype(np.float32)
    msk = np.ones((B, N), bool)
    Ks = np.broadcast_to(
        np.array([[460., 0, 256], [0, 460., 256], [0, 0, 1]], np.float32),
        (B, 3, 3)).copy()
    keys = jax.random.split(jax.random.PRNGKey(1), B)

    ops = tuple(jax.device_put(x)
                for x in (k2, k3, msk, Ks, np.asarray(keys)))

    prev = 0.0
    for stage in ("solve", "score", "lo", "refit", None):
        @jax.jit
        def f(e, k2, k3, msk, Ks, keys, stage=stage):
            def one(k2i, k3i, mi, Ki, keyi):
                return epnp.ransac_pnp(
                    keyi, k2i + e * 1e-30, k3i, mi, Ki,
                    reproj_threshold=5.0, num_hypotheses=512,
                    refine_iters=5, profile_prefix=stage)
            r = jax.vmap(one)(k2, k3, msk, Ks, keys)
            return jnp.sum(r.pose)

        ms = chain_time(f, ops)
        name = stage or "full"
        print(f"{name:8s} cumulative {ms:7.2f} ms/batch-{B}   "
              f"+{ms - prev:6.2f} ms")
        prev = ms


if __name__ == "__main__":
    main()
