#!/usr/bin/env python
"""A/B the NMS suppression-mask pool dtype on the real chip.

simple_nms is HBM-bandwidth-bound (10 separable reduce_window passes
over [8, 512, 512]); the two suppression-mask dilations per iteration
are pure boolean ORs, so pooling them as 1-byte preds instead of
fp32-casts moves 4x fewer bytes with bit-identical results
(docs/DESIGN.md §6e). This times both variants in isolation plus the
full extract under each, using the §8 chained-scalar protocol.

Prints one JSON line.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onepose_tpu.utils.chipbench import chain_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from onepose_tpu.models import superpoint as spx

    rng = np.random.default_rng(0)
    B, H, W = 8, 512, 512
    scores = jax.device_put(
        rng.uniform(0, 1, (B, H, W)).astype(np.float32))

    def nms_f32mask(s, radius=4):
        zeros = jnp.zeros_like(s)
        max_mask = s == spx._maxpool_same(s, radius)
        for _ in range(2):
            supp_mask = spx._maxpool_same(
                max_mask.astype(s.dtype), radius) > 0
            supp_scores = jnp.where(supp_mask, zeros, s)
            new_max = supp_scores == spx._maxpool_same(supp_scores, radius)
            max_mask = max_mask | (new_max & (~supp_mask))
        return jnp.where(max_mask, s, zeros)

    @jax.jit
    def f_old(e, s):
        return jnp.sum(nms_f32mask(s + e * 1e-30)).astype(jnp.float32)

    @jax.jit
    def f_new(e, s):
        return jnp.sum(spx.simple_nms(s + e * 1e-30, 4)).astype(jnp.float32)

    # equality first (on-device, same inputs)
    a = nms_f32mask(scores)
    b = spx.simple_nms(scores, 4)
    if not bool(jnp.all(a == b)):
        raise SystemExit("bench_nms: variants disagree — NOT shipping")

    out = {
        "nms_f32mask_ms": round(chain_time(f_old, (scores,)), 2),
        "nms_boolmask_ms": round(chain_time(f_new, (scores,)), 2),
        "identical": True,
    }

    # full extract in-situ under the current (bool-mask) implementation
    sp = spx.init_params(jax.random.PRNGKey(0))
    img = jax.device_put(rng.uniform(0, 1, (B, H, W, 1)).astype(np.float32))
    cfg = dict(spx.DEFAULT_CONFIG)
    cfg["max_keypoints"] = 1024
    # the shipped inference-surface stem config (DESIGN §6d)
    cfg["stem"] = "direct"
    cfg["stem_dtype"] = "bfloat16"
    items = tuple(sorted(cfg.items()))

    @jax.jit
    def f_extract(e, p, im):
        kp, sc, ds, m = spx._extract_jit(p, im + e * 1e-30, items)
        return (jnp.sum(sc) + jnp.sum(kp) + jnp.sum(ds)
                ).astype(jnp.float32)

    out["extract_ms"] = round(chain_time(f_extract, (sp, img)), 2)

    # the adjacent untried lever (VERDICT r4 Next #1b): the FULL conv
    # encoder in bf16 (score/descriptor heads' softmax/normalization
    # stay fp32 — models/superpoint.py compute_dtype), in-situ A/B
    # against the shipped config above
    cfg16 = dict(cfg)
    cfg16["compute_dtype"] = "bfloat16"
    items16 = tuple(sorted(cfg16.items()))

    @jax.jit
    def f_extract16(e, p, im):
        kp, sc, ds, m = spx._extract_jit(p, im + e * 1e-30, items16)
        return (jnp.sum(sc) + jnp.sum(kp) + jnp.sum(ds)
                ).astype(jnp.float32)

    out["extract_bf16_encoder_ms"] = round(
        chain_time(f_extract16, (sp, img)), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
