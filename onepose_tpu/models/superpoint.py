"""SuperPoint keypoint detector/descriptor, TPU-native.

Functional JAX re-implementation with the same behavior as the reference
(/root/reference/src/models/extractors/SuperPoint/superpoint.py:95-197):
VGG-style shared encoder, 65-channel detector head with channel softmax +
depth-to-space, iterative max-pool NMS, threshold/border filtering, and
bilinear descriptor sampling — but batched, NHWC, and with *static-shape*
keypoint outputs: instead of ragged per-image lists, every image yields
exactly ``max_keypoints`` slots with a validity mask, so the whole
frame→pose path jits once.

Weights load from the reference ``superpoint_v1.pth`` via
:mod:`onepose_tpu.models.convert`.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

DEFAULT_CONFIG = {
    "descriptor_dim": 256,
    "nms_radius": 4,
    "keypoint_threshold": 0.005,
    "max_keypoints": 1024,
    "remove_borders": 4,
    # "bfloat16" runs the conv encoder on the MXU in bf16 (softmax/NMS/
    # descriptor normalization stay fp32); "float32" is bit-safe default
    "compute_dtype": "float32",
    # fuse conv1a+ReLU+conv1b+ReLU+pool into one Pallas kernel (the
    # full-resolution block XLA otherwise materializes in HBM per conv).
    # False = XLA stem; True = force the width-tiled kernel; "auto" =
    # enable ONLY if `fused_stem_supported()` passes — an on-chip compile
    # + numeric diff vs the XLA stem, guarding against this toolchain's
    # Mosaic crash modes AND its silent implicit-bf16 rewrite
    # (docs/DESIGN.md §6 — a compiling kernel is not necessarily right).
    "fused_stem": False,
    # "bfloat16" runs ONLY the stem convs (conv1a/conv1b) in bf16 with
    # fp32 accumulation. Measured on v5e (r4 in-situ interleaved A/B of
    # the FULL extract, chained launches): with the polyphase stem bf16
    # is in-context NEUTRAL (12.4 vs 12.5 ms/batch-8 — the -17%
    # isolated-stem win does not survive the downstream layout, DESIGN
    # §6b's lesson again); the winning combination is
    # stem="direct" + stem_dtype="bfloat16": extract 11.35 vs 12.53
    # (-9%; 1-pass bf16 MXU beats the polyphase kernel's 4x FLOP
    # inflation, while direct fp32 LOSES at 14.0). Parity-shifting at
    # threshold boundaries → opt-in here; the inference surfaces flip it
    # behind scripts/stem_dtype_gate.py. DESIGN.md §6c/§6d.
    "stem_dtype": "float32",
    # "polyphase" computes the same stem in space-to-depth (block) form:
    # both convs run on a 256x256 grid with 256-wide channel dims (full MXU
    # lanes vs 64) and the 2x2 maxpool collapses into a max over the 4
    # output phases. Same MACs up to fp reassociation. Measured on v5e
    # end-to-end (interleaved A/B, chained launches): 21.3 vs 22.9
    # ms/batch-8 for the full pipeline — polyphase wins despite 4x FLOP
    # inflation of the zero-padded block kernel, because MXU utilization
    # rises 3x and the pool/layout fuse downstream. See docs/DESIGN.md §6b.
    "stem": "polyphase",
    # True routes keypoint selection through _nms_aware_top_k's two-stage
    # row-chunked top-k (2.34 vs 4.10 ms/batch-8 standalone at 512x512/
    # k=1024 on v5e). Exact on EVERY input since r5: a per-chunk
    # truncation certificate falls back to the flat top_k via lax.cond
    # when a tie plateau floods a chunk (see _nms_aware_top_k). Default
    # still follows the r4 in-situ finding that XLA overlaps the flat
    # top_k in-pipeline at protocol shapes; safe to enable at any image
    # size, wins standalone or at much larger score maps.
    "two_stage_topk": False,
}

_ENCODER_CHANNELS = [
    # (name, in, out); "pool" entries mark 2x2 max-pool boundaries
    ("conv1a", 1, 64), ("conv1b", 64, 64), ("pool",),
    ("conv2a", 64, 64), ("conv2b", 64, 64), ("pool",),
    ("conv3a", 64, 128), ("conv3b", 128, 128), ("pool",),
    ("conv4a", 128, 128), ("conv4b", 128, 128),
]


class SuperPointOutput(NamedTuple):
    """Static-shape extraction result for a batch of images.

    keypoints:   [B, K, 2] float (x, y) pixel coords; garbage where ~valid
    scores:      [B, K] float detection scores (0 where ~valid)
    descriptors: [B, K, D] L2-normalized descriptors (1s where ~valid, the
                 reference's "dustbin" padding convention,
                 data_utils.py:157-158)
    mask:        [B, K] bool validity
    """

    keypoints: jnp.ndarray
    scores: jnp.ndarray
    descriptors: jnp.ndarray
    mask: jnp.ndarray


# ---------------------------------------------------------------------------
# Parameter init / structure
# ---------------------------------------------------------------------------

def init_params(rng: jax.Array, descriptor_dim: int = 256) -> Params:
    """Random init (He) with the same layer structure as the reference net."""
    params = {}
    keys = jax.random.split(rng, 16)
    k = iter(range(16))

    def conv(key, cin, cout, ksize):
        fan_in = cin * ksize * ksize
        w = jax.random.normal(key, (ksize, ksize, cin, cout), jnp.float32)
        w = w * np.sqrt(2.0 / fan_in)
        return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}

    for entry in _ENCODER_CHANNELS:
        if entry[0] == "pool":
            continue
        name, cin, cout = entry
        params[name] = conv(keys[next(k)], cin, cout, 3)
    params["convPa"] = conv(keys[next(k)], 128, 256, 3)
    params["convPb"] = conv(keys[next(k)], 256, 65, 1)
    params["convDa"] = conv(keys[next(k)], 128, 256, 3)
    params["convDb"] = conv(keys[next(k)], 256, descriptor_dim, 1)
    return params


# ---------------------------------------------------------------------------
# Dense network
# ---------------------------------------------------------------------------

def _conv2d(x: jnp.ndarray, p: Params, padding: str = "SAME") -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"]


def _maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def _polyphase_stem_weights(w1a: jnp.ndarray, b1a: jnp.ndarray,
                            w1b: jnp.ndarray, b1b: jnp.ndarray):
    """Re-index the stem convs into space-to-depth (block) form.

    A stride-1 3x3 conv on the full-res grid becomes a 3x3 conv on the
    half-res block grid whose channels enumerate (phase, channel) pairs:
    output pixel (2i+py, 2j+px) reads input pixel (2(i+di)+qy, 2(j+dj)+qx),
    i.e. full-res tap (u, v) = (2*di + qy - py, 2*dj + qx - px); taps
    outside the 3x3 support get zero weight. Phases are enumerated
    row-major (ph = 2*py + px) and channels phase-major (o = ph*C + c).

    w1a: [3,3,1,C1] → [3,3,4,4*C1]; w1b: [3,3,C1,C2] → [3,3,4*C1,4*C2].
    """
    c1 = w1a.shape[-1]
    c2 = w1b.shape[-1]
    wa = jnp.zeros((3, 3, 4, 4 * c1), w1a.dtype)
    wb = jnp.zeros((3, 3, 4 * c1, 4 * c2), w1b.dtype)
    for py in range(2):
        for px in range(2):
            op = 2 * py + px
            for qy in range(2):
                for qx in range(2):
                    ip = 2 * qy + qx
                    for di in (-1, 0, 1):
                        u = 2 * di + qy - py
                        if not -1 <= u <= 1:
                            continue
                        for dj in (-1, 0, 1):
                            v = 2 * dj + qx - px
                            if not -1 <= v <= 1:
                                continue
                            wa = wa.at[di + 1, dj + 1, ip,
                                       op * c1:(op + 1) * c1].set(
                                w1a[u + 1, v + 1, 0])
                            wb = wb.at[di + 1, dj + 1,
                                       ip * c1:(ip + 1) * c1,
                                       op * c2:(op + 1) * c2].set(
                                w1b[u + 1, v + 1])
    ba = jnp.tile(b1a, 4)
    bb = jnp.tile(b1b, 4)
    return wa, ba, wb, bb


def _polyphase_stem(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """conv1a+ReLU+conv1b+ReLU+2x2maxpool in space-to-depth form.

    x: [B, H, W, 1] → [B, H/2, W/2, C1]. Exact up to fp reassociation vs
    the direct path; both convs run at half resolution with 4x wider
    channels (full 128-lane MXU tiles instead of 64), and the pool never
    touches HBM — it is a max over the 4 phase groups of conv1b's output.
    """
    b, h, w, _ = x.shape
    c1 = params["conv1b"]["w"].shape[-1]
    wa, ba, wb, bb = _polyphase_stem_weights(
        params["conv1a"]["w"], params["conv1a"]["b"],
        params["conv1b"]["w"], params["conv1b"]["b"])
    # space-to-depth: channel = 2*qy + qx for pixel (2i+qy, 2j+qx)
    xb = x.reshape(b, h // 2, 2, w // 2, 2)
    xb = xb.transpose(0, 1, 3, 2, 4).reshape(b, h // 2, w // 2, 4)
    y = jax.nn.relu(_conv2d(xb, {"w": wa, "b": ba}))
    y = jax.nn.relu(_conv2d(y, {"w": wb, "b": bb}))
    # 2x2 maxpool stride 2 == max over the 4 output phases of each block
    y = y.reshape(b, h // 2, w // 2, 4, c1)
    return jnp.max(y, axis=3)


_FUSED_STEM_OK = None


def fused_stem_supported(force_recheck: bool = False) -> bool:
    """Automated safety gate for the fused Pallas stem (VERDICT r2 #3 /
    DESIGN.md §6): compile the width-tiled kernel on the CURRENT default
    backend and numerically diff it against the fp32 XLA stem on random
    data. Any compile failure (the Mosaic crash modes) or numeric
    deviation (the silent implicit-bf16 rewrite measured at ~5e-3) fails
    the gate and callers fall back to the XLA stem. Cached per process.
    """
    global _FUSED_STEM_OK
    if _FUSED_STEM_OK is not None and not force_recheck:
        return _FUSED_STEM_OK

    from onepose_tpu.ops.pallas_stem import fused_stem_tiled

    try:
        rng = np.random.default_rng(0)
        params = init_params(jax.random.PRNGKey(0))
        imgs = jnp.asarray(
            rng.uniform(0, 1, (2, 64, 256, 1)).astype(np.float32))
        x = jax.nn.relu(_conv2d(imgs, params["conv1a"]))
        x = jax.nn.relu(_conv2d(x, params["conv1b"]))
        ref = np.asarray(_maxpool2(x))
        got = np.asarray(fused_stem_tiled(
            imgs, params["conv1a"]["w"], params["conv1a"]["b"],
            params["conv1b"]["w"], params["conv1b"]["b"],
            interpret=jax.default_backend() not in ("tpu", "axon")))
        err = float(np.abs(got - ref).max())
        _FUSED_STEM_OK = bool(
            np.isfinite(err) and err < 1e-4 * max(np.abs(ref).max(), 1.0))
        if not _FUSED_STEM_OK:
            print(f"[superpoint] fused stem numeric gate FAILED "
                  f"(max diff {err:.2e}) — falling back to XLA stem")
    except Exception as e:  # compile crash (Mosaic HTTP 500 etc.)
        print(f"[superpoint] fused stem compile gate FAILED "
              f"({type(e).__name__}) — falling back to XLA stem")
        _FUSED_STEM_OK = False
    return _FUSED_STEM_OK


def resolve_fused_stem(cfg: dict) -> dict:
    """Resolve ``fused_stem: 'auto'`` to a concrete bool via the gate.
    Call OUTSIDE jit (config prep time)."""
    if cfg.get("fused_stem") == "auto":
        cfg = dict(cfg)
        cfg["fused_stem"] = fused_stem_supported()
    return cfg


def dense_heads(params: Params, images: jnp.ndarray,
                compute_dtype: str = "float32",
                fused_stem: bool = False,
                stem: str = "polyphase",
                stem_dtype: str = "float32"):
    """Shared encoder + both heads.

    images: [B, H, W, 1] grayscale in [0, 1]. H, W divisible by 8.
    Returns (scores [B, H, W], desc_coarse [B, H/8, W/8, D] L2-normalized).
    """
    cdt = jnp.dtype(compute_dtype)
    if cdt != jnp.float32:
        params = jax.tree.map(lambda p: p.astype(cdt), params)
    encoder = _ENCODER_CHANNELS
    if fused_stem and cdt == jnp.float32:
        from onepose_tpu.ops.pallas_stem import fused_stem_tiled as _stem

        interpret = jax.default_backend() not in ("tpu", "axon")
        x = _stem(images.astype(jnp.float32),
                  params["conv1a"]["w"], params["conv1a"]["b"],
                  params["conv1b"]["w"], params["conv1b"]["b"],
                  interpret=interpret)
        encoder = _ENCODER_CHANNELS[3:]  # skip conv1a/conv1b/pool
    elif stem == "polyphase":
        sdt = jnp.dtype(stem_dtype)
        if cdt == jnp.float32 and sdt != jnp.float32:
            p_stem = {**params, **jax.tree.map(
                lambda t: t.astype(sdt),
                {"conv1a": params["conv1a"], "conv1b": params["conv1b"]})}
            x = _polyphase_stem(
                p_stem, images.astype(sdt)).astype(jnp.float32)
        else:
            x = _polyphase_stem(params, images.astype(cdt))
        encoder = _ENCODER_CHANNELS[3:]  # skip conv1a/conv1b/pool
    elif stem == "direct":
        # full-res NHWC stem honoring stem_dtype (the in-situ A/B lever;
        # DESIGN §6b measured layout-dependent ranking flips, so every
        # stem variant must be expressible under the same config surface)
        sdt = jnp.dtype(stem_dtype) if cdt == jnp.float32 else cdt
        x = images.astype(sdt)
        for name in ("conv1a", "conv1b"):
            p = jax.tree.map(lambda t: t.astype(sdt), params[name])
            x = jax.nn.relu(_conv2d(x, p))
        x = _maxpool2(x).astype(cdt)
        encoder = _ENCODER_CHANNELS[3:]  # skip conv1a/conv1b/pool
    else:
        x = images.astype(cdt)
    for entry in encoder:
        if entry[0] == "pool":
            x = _maxpool2(x)
        else:
            x = jax.nn.relu(_conv2d(x, params[entry[0]]))

    # Both heads' first convs read the same trunk output; fuse them into a
    # single 128→512 conv (XLA does not merge convolutions) and split
    # channels — per-channel results are identical.
    w_heads = jnp.concatenate(
        [params["convPa"]["w"], params["convDa"]["w"]], axis=-1)
    b_heads = jnp.concatenate(
        [params["convPa"]["b"], params["convDa"]["b"]])
    heads = jax.nn.relu(_conv2d(x, {"w": w_heads, "b": b_heads}))
    cpa, cda = heads[..., :256], heads[..., 256:]

    # Detector head: 65ch softmax, drop dustbin, 8x depth-to-space.
    logits = _conv2d(cpa, params["convPb"]).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)[..., :-1]  # [B, Hc, Wc, 64]
    b, hc, wc, _ = probs.shape
    scores = probs.reshape(b, hc, wc, 8, 8)
    scores = scores.transpose(0, 1, 3, 2, 4).reshape(b, hc * 8, wc * 8)

    # Descriptor head.
    desc = _conv2d(cda, params["convDb"]).astype(jnp.float32)
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12
    )
    return scores, desc


# ---------------------------------------------------------------------------
# NMS + keypoint selection (static shapes)
# ---------------------------------------------------------------------------

def _maxpool_same(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Max-pool [B, H, W] with window 2r+1, stride 1, SAME padding.

    Separable rows-then-cols passes: 2(2r+1) compares/px instead of
    (2r+1)^2 — identical result, measured 3.97 -> 2.91 ms/batch-8 on v5e
    for the full NMS at 512^2 (XLA does not do this rewrite itself)."""
    k = 2 * radius + 1
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, k, 1), window_strides=(1, 1, 1),
        padding=((0, 0), (radius, radius), (0, 0)),
    )
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, k), window_strides=(1, 1, 1),
        padding=((0, 0), (0, 0), (radius, radius)),
    )


def _maxpool_or(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Boolean dilation: [B, H, W] bool window-OR with window 2r+1,
    stride 1, SAME. Equivalent to `_maxpool_same(mask.astype(f32)) > 0`
    but the two separable passes move 1-byte preds instead of 4-byte
    floats — NMS is HBM-bandwidth-bound, so the mask pools are ~4x
    cheaper this way."""
    k = 2 * radius + 1
    mask = jax.lax.reduce_window(
        mask, False, jax.lax.bitwise_or,
        window_dimensions=(1, k, 1), window_strides=(1, 1, 1),
        padding=((0, 0), (radius, radius), (0, 0)),
    )
    return jax.lax.reduce_window(
        mask, False, jax.lax.bitwise_or,
        window_dimensions=(1, 1, k), window_strides=(1, 1, 1),
        padding=((0, 0), (0, 0), (radius, radius)),
    )


def simple_nms(scores: jnp.ndarray, nms_radius: int) -> jnp.ndarray:
    """Iterative max-pool NMS, identical recurrence to the reference
    (superpoint.py:47-62): two suppression rounds re-admitting local maxima of
    the suppressed map."""
    zeros = jnp.zeros_like(scores)
    max_mask = scores == _maxpool_same(scores, nms_radius)
    for _ in range(2):
        supp_mask = _maxpool_or(max_mask, nms_radius)
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == _maxpool_same(supp_scores, nms_radius)
        max_mask = max_mask | (new_max_mask & (~supp_mask))
    return jnp.where(max_mask, scores, zeros)


def _bilinear_sample_desc(desc: jnp.ndarray, kpts_xy: jnp.ndarray,
                          s: int = 8) -> jnp.ndarray:
    """Sample the coarse descriptor map at keypoint pixel locations.

    Reproduces the reference coordinate mapping (superpoint.py:80-92):
    normalized = ((kpt - s/2 + 0.5) / (dim*s - s/2 - 0.5)) * 2 - 1, sampled
    with bilinear interpolation, align_corners=True, zero padding, then
    L2-normalized over channels.

    desc: [Hc, Wc, D]; kpts_xy: [K, 2] (x, y) full-res pixels → [K, D].
    """
    hc, wc, d = desc.shape
    denom = jnp.array(
        [wc * s - s / 2.0 - 0.5, hc * s - s / 2.0 - 0.5], jnp.float32
    )
    g = (kpts_xy - s / 2.0 + 0.5) / denom * 2.0 - 1.0  # in (-1, 1)
    # align_corners=True: -1 → 0, +1 → dim-1
    fx = (g[:, 0] + 1.0) * 0.5 * (wc - 1)
    fy = (g[:, 1] + 1.0) * 0.5 * (hc - 1)

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < hc) & (xi >= 0) & (xi < wc)
        yi_c = jnp.clip(yi, 0, hc - 1).astype(jnp.int32)
        xi_c = jnp.clip(xi, 0, wc - 1).astype(jnp.int32)
        vals = desc[yi_c, xi_c]  # [K, D]
        return jnp.where(inb[:, None], vals, 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    out = (
        v00 * ((1 - tx) * (1 - ty))[:, None]
        + v01 * (tx * (1 - ty))[:, None]
        + v10 * ((1 - tx) * ty)[:, None]
        + v11 * (tx * ty)[:, None]
    )
    return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)


def _nms_aware_top_k(masked: jnp.ndarray, k: int, nms_radius: int,
                     enabled: bool = False):
    """Two-stage top-k over a post-NMS score map.

    When distinct-valued survivors are > nms_radius apart in Chebyshev
    distance, a chunk of ``ch`` rows holds at most
    ceil(ch/(r+1)) * ceil(W/(r+1)) candidates — top-k within row chunks
    followed by top-k over the gathered candidates then equals the flat
    top_k, tie-order included. Measured 4.10 -> 2.34 ms/batch-8 at
    512x512/k=1024 on v5e vs the flat jax.lax.top_k.

    Tie-plateau safety (VERDICT r4 Next #6): exactly-tied scores break
    the spacing bound — simple_nms keeps EVERY pixel of a constant-score
    region (ties pass ``scores == maxpool``), so a flat saturated area
    above the keypoint threshold can flood its chunk past ``kc``. The
    chunked result is exact iff no chunk truncated a VALID candidate:
    everything a chunk drops is <= its kc-th kept value, and valid
    entries are strictly positive (invalid = -1.0 sentinel; threshold
    masking is ``scores > thr`` with thr >= 0), so a boundary value
    <= 0 proves only invalid entries were dropped. A traced lax.cond
    falls back to the flat top_k exactly when some chunk's boundary is
    positive — bit-equal output on every input, fast path whenever the
    spacing bound actually holds (tie-free maps never fill a chunk).
    Tie ORDER also matches the flat top_k on the fast path: candidates
    are gathered chunk-ascending then within-chunk index-ascending,
    which is row-major order — lax.top_k's own tie rule.

    Still ships default-False: in-pipeline the flat top_k measured
    perf-neutral at protocol shapes (XLA overlaps it), so the default
    follows the in-situ measurement, not the standalone one (DESIGN
    §6b). The flag is now safe to enable at any image size.
    """
    h, w = masked.shape
    ch = 8
    r1 = nms_radius + 1
    if enabled and h % ch == 0:
        nch = h // ch
        kc = min(-(-ch // r1) * -(-w // r1), ch * w)
        if nch > 1 and nch * kc < h * w // 2 and k <= nch * kc:
            v, i = jax.lax.top_k(masked.reshape(nch, ch * w), kc)
            base = jnp.arange(nch, dtype=jnp.int32)[:, None] * (ch * w)
            gi = i.astype(jnp.int32) + base
            # exactness certificate (kc == ch*w keeps everything — the
            # outer min() makes that the only tie-unsafe-free case here)
            safe = jnp.all(v[:, -1] <= 0.0) if kc < ch * w \
                else jnp.bool_(True)

            def chunked(_):
                top_scores, ti = jax.lax.top_k(v.reshape(-1), k)
                return top_scores, jnp.take(gi.reshape(-1), ti)

            def flat(_):
                fv, fi = jax.lax.top_k(masked.reshape(-1), k)
                return fv, fi

            return jax.lax.cond(safe, chunked, flat, None)
    return jax.lax.top_k(masked.reshape(-1), k)


def _select_keypoints_single(scores: jnp.ndarray, desc: jnp.ndarray,
                             config: dict) -> SuperPointOutput:
    """Static top-K keypoint selection for one image.

    scores: [H, W] post-NMS; desc: [Hc, Wc, D].
    """
    h, w = scores.shape
    k = config["max_keypoints"]
    border = config["remove_borders"]
    thr = config["keypoint_threshold"]

    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border_ok = (
        (row >= border) & (row < h - border)
        & (col >= border) & (col < w - border)
    )
    masked = jnp.where(border_ok & (scores > thr), scores, -1.0)

    top_scores, top_idx = _nms_aware_top_k(
        masked, k, config["nms_radius"],
        config.get("two_stage_topk", False))
    ys = (top_idx // w).astype(jnp.float32)
    xs = (top_idx % w).astype(jnp.float32)
    valid = top_scores > 0.0

    kpts = jnp.stack([xs, ys], axis=-1)  # (x, y)
    descs = _bilinear_sample_desc(desc, kpts)
    # Invalid slots: dustbin convention — all-ones descriptors, score 0,
    # keypoints parked at the image center (harmless for matching; masked).
    descs = jnp.where(valid[:, None], descs, 1.0)
    out_scores = jnp.where(valid, top_scores, 0.0)
    kpts = jnp.where(
        valid[:, None], kpts,
        jnp.array([w / 2.0, h / 2.0], jnp.float32),
    )
    return SuperPointOutput(kpts, out_scores, descs, valid)


@functools.partial(jax.jit, static_argnames=("config_items",))
def _extract_jit(params: Params, images: jnp.ndarray, config_items):
    config = dict(config_items)
    scores, desc = dense_heads(
        params, images, config.get("compute_dtype", "float32"),
        config.get("fused_stem", False),
        config.get("stem", "polyphase"),
        config.get("stem_dtype", "float32"))
    scores = simple_nms(scores, config["nms_radius"])
    return jax.vmap(lambda s, d: _select_keypoints_single(s, d, config))(
        scores, desc
    )


def extract(params: Params, images: jnp.ndarray,
            config: dict | None = None) -> SuperPointOutput:
    """End-to-end jitted extraction. images: [B, H, W, 1] in [0, 1]."""
    cfg = dict(DEFAULT_CONFIG)
    if config:
        cfg.update(config)
    if cfg["max_keypoints"] is None or cfg["max_keypoints"] < 0:
        raise ValueError(
            "TPU-native SuperPoint requires a static max_keypoints budget"
        )
    return _extract_jit(params, images, tuple(sorted(cfg.items())))
