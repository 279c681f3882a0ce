"""SuperGlue 2D-2D matcher, TPU-native.

Functional JAX re-implementation behaviorally matching the reference
(/root/reference/src/models/matchers/SuperGlue/superglue.py:177-276):
keypoint normalization, keypoint MLP encoder fused additively with
descriptors, 18-layer self/cross softmax-attention GNN (4 heads, dim 256),
final 1x1 projection, log-space Sinkhorn optimal transport with a learned
dustbin score (100 iterations), mutual-max + threshold matching.

Token layout is [B, N, D]; score/Sinkhorn math kept in fp32.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

DEFAULT_CONFIG = {
    "descriptor_dim": 256,
    "keypoint_encoder": (32, 64, 128, 256),
    "num_gnn_layers": 18,  # ['self', 'cross'] * 9
    "num_heads": 4,
    "sinkhorn_iterations": 100,
    "match_threshold": 0.2,
}


class SuperGlueOutput(NamedTuple):
    matches0: jnp.ndarray
    matches1: jnp.ndarray
    matching_scores0: jnp.ndarray
    matching_scores1: jnp.ndarray


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _linear_init(key, cin, cout):
    bound = np.sqrt(1.0 / cin)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (cin, cout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound),
    }


def _bn_init(c):
    return {
        "gamma": jnp.ones((c,), jnp.float32),
        "beta": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def _init_mlp_bn(key, channels):
    """MLP of 1x1 convs with BatchNorm+ReLU between (superglue.py:49-60)."""
    layers = []
    keys = jax.random.split(key, len(channels) - 1)
    for i in range(1, len(channels)):
        entry = {"lin": _linear_init(keys[i - 1], channels[i - 1], channels[i])}
        if i < len(channels) - 1:
            entry["bn"] = _bn_init(channels[i])
        layers.append(entry)
    return layers


def _init_attn_prop(key, d):
    keys = jax.random.split(key, 5)
    return {
        "proj_q": _linear_init(keys[0], d, d),
        "proj_k": _linear_init(keys[1], d, d),
        "proj_v": _linear_init(keys[2], d, d),
        "merge": _linear_init(keys[3], d, d),
        "mlp": _init_mlp_bn(keys[4], [2 * d, 2 * d, d]),
    }


def init_params(rng: jax.Array, config: Optional[dict] = None) -> Params:
    cfg = dict(DEFAULT_CONFIG)
    if config:
        cfg.update(config)
    d = cfg["descriptor_dim"]
    keys = jax.random.split(rng, cfg["num_gnn_layers"] + 2)
    return {
        "kenc": _init_mlp_bn(keys[0], [3, *cfg["keypoint_encoder"]]),
        "gnn": [_init_attn_prop(keys[i + 1], d)
                for i in range(cfg["num_gnn_layers"])],
        "final_proj": _linear_init(keys[-1], d, d),
        "bin_score": jnp.array(1.0, jnp.float32),
    }


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------

def _linear(x, p):
    return jnp.einsum(
        "...i,io->...o", x, p["w"], preferred_element_type=jnp.float32
    ) + p["b"]


def _apply_mlp_bn(layers, x):
    for i, layer in enumerate(layers):
        x = _linear(x, layer["lin"])
        if "bn" in layer:
            bn = layer["bn"]
            x = (x - bn["mean"]) * jax.lax.rsqrt(bn["var"] + 1e-5)
            x = x * bn["gamma"] + bn["beta"]
            x = jax.nn.relu(x)
    return x


def normalize_keypoints(kpts: jnp.ndarray, height, width) -> jnp.ndarray:
    """Center + 0.7*max-dim scaling (superglue.py:63-70). kpts: [B, N, 2]."""
    size = jnp.array([width, height], jnp.float32)
    center = size / 2.0
    scaling = jnp.max(size) * 0.7
    return (kpts - center) / scaling


def keypoint_encoder(p, kpts, scores):
    """[B,N,2] kpts + [B,N] scores → [B,N,D] positional embedding."""
    inputs = jnp.concatenate([kpts, scores[..., None]], axis=-1)
    return _apply_mlp_bn(p, inputs)


def _split_heads(x, num_heads):
    b, n, d = x.shape
    return x.reshape(b, n, d // num_heads, num_heads).transpose(0, 1, 3, 2)


def _merge_heads(x):
    b, n, h, dh = x.shape
    return x.transpose(0, 1, 3, 2).reshape(b, n, h * dh)


def softmax_attention(q, k, v):
    """q: [B,Nq,H,D]; k,v: [B,Nk,H,D] (superglue.py:85-89)."""
    d = q.shape[-1]
    scores = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32) / jnp.sqrt(
        jnp.float32(d))
    prob = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", prob, v,
                      preferred_element_type=jnp.float32)


def attention_propagation(p, x, source, num_heads):
    # Q/K/V fused into wider matmuls (XLA won't merge separate dots over
    # the same operand; see gats_spg.attention_propagation).
    d = x.shape[-1]
    if x is source:
        w = jnp.concatenate(
            [p["proj_q"]["w"], p["proj_k"]["w"], p["proj_v"]["w"]], axis=1)
        b = jnp.concatenate(
            [p["proj_q"]["b"], p["proj_k"]["b"], p["proj_v"]["b"]])
        qkv = _linear(x, {"w": w, "b": b})
        q = _split_heads(qkv[..., :d], num_heads)
        k = _split_heads(qkv[..., d:2 * d], num_heads)
        v = _split_heads(qkv[..., 2 * d:], num_heads)
    else:
        w_kv = jnp.concatenate(
            [p["proj_k"]["w"], p["proj_v"]["w"]], axis=1)
        b_kv = jnp.concatenate([p["proj_k"]["b"], p["proj_v"]["b"]])
        kv = _linear(source, {"w": w_kv, "b": b_kv})
        q = _split_heads(_linear(x, p["proj_q"]), num_heads)
        k = _split_heads(kv[..., :d], num_heads)
        v = _split_heads(kv[..., d:], num_heads)
    message = _linear(_merge_heads(softmax_attention(q, k, v)), p["merge"])
    return _apply_mlp_bn(p["mlp"], jnp.concatenate([x, message], axis=-1))


# ---------------------------------------------------------------------------
# Sinkhorn optimal transport (log space)
# ---------------------------------------------------------------------------

def log_optimal_transport(scores: jnp.ndarray, alpha: jnp.ndarray,
                          iters: int) -> jnp.ndarray:
    """Log-space Sinkhorn with a learned dustbin row/column
    (superglue.py:141-170). scores: [B, M, N] fp32 → [B, M+1, N+1]."""
    b, m, n = scores.shape
    ms, ns = jnp.float32(m), jnp.float32(n)

    bins0 = jnp.broadcast_to(alpha, (b, m, 1))
    bins1 = jnp.broadcast_to(alpha, (b, 1, n))
    alpha_c = jnp.broadcast_to(alpha, (b, 1, 1))
    couplings = jnp.concatenate(
        [jnp.concatenate([scores, bins0], axis=-1),
         jnp.concatenate([bins1, alpha_c], axis=-1)], axis=1
    )

    norm = -jnp.log(ms + ns)
    log_mu = jnp.concatenate(
        [jnp.full((m,), norm), jnp.log(ns)[None] + norm])
    log_nu = jnp.concatenate(
        [jnp.full((n,), norm), jnp.log(ms)[None] + norm])
    log_mu = jnp.broadcast_to(log_mu[None], (b, m + 1))
    log_nu = jnp.broadcast_to(log_nu[None], (b, n + 1))

    def body(_, uv):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(couplings + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(couplings + u[:, :, None], axis=1)
        return u, v

    u, v = jax.lax.fori_loop(
        0, iters, body, (jnp.zeros_like(log_mu), jnp.zeros_like(log_nu))
    )
    return couplings + u[:, :, None] + v[:, None, :] - norm


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def forward(params: Params, data: Dict[str, jnp.ndarray],
            config: Optional[dict] = None) -> SuperGlueOutput:
    """data keys ([B, N, D] layout):
      keypoints0/1: [B, N, 2]; scores0/1: [B, N]; descriptors0/1: [B, N, D];
      shape0/1: (height, width) static ints;
      (optional) mask0/1: [B, N] bool validity for padded slots.
    """
    cfg = dict(DEFAULT_CONFIG)
    if config:
        cfg.update(config)

    desc0 = data["descriptors0"].astype(jnp.float32)
    desc1 = data["descriptors1"].astype(jnp.float32)
    kpts0 = normalize_keypoints(
        data["keypoints0"].astype(jnp.float32), *data["shape0"])
    kpts1 = normalize_keypoints(
        data["keypoints1"].astype(jnp.float32), *data["shape1"])

    desc0 = desc0 + keypoint_encoder(params["kenc"], kpts0, data["scores0"])
    desc1 = desc1 + keypoint_encoder(params["kenc"], kpts1, data["scores1"])

    for i, p in enumerate(params["gnn"]):
        if i % 2 == 1:  # cross (layers alternate self, cross)
            src0, src1 = desc1, desc0
        else:
            src0, src1 = desc0, desc1
        delta0 = attention_propagation(p, desc0, src0, cfg["num_heads"])
        delta1 = attention_propagation(p, desc1, src1, cfg["num_heads"])
        desc0, desc1 = desc0 + delta0, desc1 + delta1

    mdesc0 = _linear(desc0, params["final_proj"])
    mdesc1 = _linear(desc1, params["final_proj"])

    scores = jnp.einsum("bnd,bmd->bnm", mdesc0, mdesc1,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(cfg["descriptor_dim"]))

    mask0 = data.get("mask0")
    mask1 = data.get("mask1")
    if mask0 is not None or mask1 is not None:
        # Padded slots route to the dustbin: a large negative score keeps the
        # Sinkhorn marginals behaving as if the slot were absent.
        big_neg = jnp.float32(-1e9)
        if mask0 is not None:
            scores = jnp.where(mask0[:, :, None], scores, big_neg)
        if mask1 is not None:
            scores = jnp.where(mask1[:, None, :], scores, big_neg)

    Z = log_optimal_transport(
        scores, params["bin_score"], cfg["sinkhorn_iterations"])

    inner = Z[:, :-1, :-1]
    b, n0, n1 = inner.shape
    indices0 = jnp.argmax(inner, axis=2)
    indices1 = jnp.argmax(inner, axis=1)
    max0 = jnp.max(inner, axis=2)

    ar0 = jnp.arange(n0)[None, :]
    ar1 = jnp.arange(n1)[None, :]
    mutual0 = ar0 == jnp.take_along_axis(indices1, indices0, axis=1)
    mutual1 = ar1 == jnp.take_along_axis(indices0, indices1, axis=1)

    mscores0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
    mscores1 = jnp.where(
        mutual1, jnp.take_along_axis(mscores0, indices1, axis=1), 0.0)
    valid0 = mutual0 & (mscores0 > cfg["match_threshold"])
    if mask0 is not None:
        valid0 &= mask0
    if mask1 is not None:
        valid0 &= jnp.take_along_axis(mask1, indices0, axis=1)
    valid1 = mutual1 & jnp.take_along_axis(valid0, indices1, axis=1)

    matches0 = jnp.where(valid0, indices0, -1).astype(jnp.int32)
    matches1 = jnp.where(valid1, indices1, -1).astype(jnp.int32)
    return SuperGlueOutput(matches0, matches1, mscores0, mscores1)


@functools.partial(jax.jit, static_argnames=("shape0", "shape1",
                                             "config_items"))
def _forward_jit(params, data, shape0, shape1, config_items):
    data = dict(data)
    data["shape0"] = shape0
    data["shape1"] = shape1
    return forward(params, data, dict(config_items))


def match(params: Params, data: Dict[str, jnp.ndarray],
          config: Optional[dict] = None) -> SuperGlueOutput:
    cfg = dict(DEFAULT_CONFIG)
    if config:
        cfg.update(config)
    data = dict(data)
    shape0 = tuple(data.pop("shape0"))
    shape1 = tuple(data.pop("shape1"))
    return _forward_jit(params, data, shape0, shape1,
                        tuple(sorted(cfg.items())))
