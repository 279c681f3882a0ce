"""Fused SuperPoint stem kernel vs the XLA conv path (interpret mode)."""
import numpy as np

import jax
import jax.numpy as jnp

from onepose_tpu.models import superpoint
from onepose_tpu.ops.pallas_stem import fused_stem


def reference_stem(images, w1a, b1a, w1b, b1b):
    p = {"conv1a": {"w": w1a, "b": b1a}, "conv1b": {"w": w1b, "b": b1b}}
    x = jax.nn.relu(superpoint._conv2d(images, p["conv1a"]))
    x = jax.nn.relu(superpoint._conv2d(x, p["conv1b"]))
    return superpoint._maxpool2(x)


def test_fused_stem_matches_xla():
    rng = np.random.default_rng(0)
    B, H, W = 2, 64, 128
    images = jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)).astype(np.float32))
    w1a = jnp.asarray(rng.normal(size=(3, 3, 1, 64)).astype(np.float32)
                      * 0.2)
    b1a = jnp.asarray(rng.normal(size=(64,)).astype(np.float32) * 0.1)
    w1b = jnp.asarray(rng.normal(size=(3, 3, 64, 64)).astype(np.float32)
                      * 0.05)
    b1b = jnp.asarray(rng.normal(size=(64,)).astype(np.float32) * 0.1)

    ref = np.asarray(reference_stem(images, w1a, b1a, w1b, b1b))
    got = np.asarray(fused_stem(images, w1a, b1a, w1b, b1b, rows=16,
                                interpret=True))
    assert got.shape == ref.shape == (B, H // 2, W // 2, 64)
    np.testing.assert_allclose(got, ref, atol=2e-4)
