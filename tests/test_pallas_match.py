"""Pallas fused dual-softmax argmax vs the reference XLA computation
(interpret mode on CPU)."""
import numpy as np

import jax
import jax.numpy as jnp

from onepose_tpu.ops.pallas_match import dual_softmax_argmax


def reference(mdesc0, mdesc1, scale):
    s = jnp.einsum("bnd,bmd->bnm", mdesc0, mdesc1) / scale
    conf = jax.nn.softmax(s, axis=1) * jax.nn.softmax(s, axis=2)
    return (jnp.argmax(conf, 2), jnp.max(conf, 2),
            jnp.argmax(conf, 1), jnp.max(conf, 1))


def _unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_matches_reference():
    rng = np.random.default_rng(0)
    B, N1, N2, D = 2, 200, 144, 32
    d0 = jnp.asarray(_unit(rng.normal(size=(B, N1, D))).astype(np.float32))
    d1 = jnp.asarray(_unit(rng.normal(size=(B, N2, D))).astype(np.float32))

    i0, m0, i1, m1 = dual_softmax_argmax(
        d0, d1, 0.07, tile_n1=64, interpret=True)
    ri0, rm0, ri1, rm1 = reference(d0, d1, 0.07)

    np.testing.assert_array_equal(np.asarray(i0), np.asarray(ri0))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(ri1))
    np.testing.assert_allclose(np.asarray(m0), np.asarray(rm0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(rm1), atol=1e-6)


def test_ragged_n1():
    """N1 not a multiple of the tile: padded rows must not affect column
    statistics or argmaxes."""
    rng = np.random.default_rng(1)
    B, N1, N2, D = 1, 70, 48, 16
    d0 = jnp.asarray(_unit(rng.normal(size=(B, N1, D))).astype(np.float32))
    d1 = jnp.asarray(_unit(rng.normal(size=(B, N2, D))).astype(np.float32))
    i0, m0, i1, m1 = dual_softmax_argmax(
        d0, d1, 0.07, tile_n1=32, interpret=True)
    ri0, rm0, ri1, rm1 = reference(d0, d1, 0.07)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(ri0))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(ri1))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(rm1), atol=1e-6)


def test_forward_match_only_agrees_with_forward():
    """The Pallas inference path must produce the same matches as the
    standard forward."""
    import jax

    from onepose_tpu.models import gats_spg

    rng = np.random.default_rng(2)
    params = gats_spg.init_params(jax.random.PRNGKey(0), {"num_blocks": 1})
    B, N1, N2, L = 2, 64, 48, 2
    data = {
        "descriptors2d_query": jnp.asarray(
            _unit(rng.normal(size=(B, N1, 256))).astype(np.float32)),
        "descriptors3d_db": jnp.asarray(
            _unit(rng.normal(size=(B, N2, 256))).astype(np.float32)),
        "descriptors2d_db": jnp.asarray(
            _unit(rng.normal(size=(B, N2 * L, 256))).astype(np.float32)),
        "mask2d": jnp.asarray(
            np.arange(N1)[None, :] < np.array([[50], [64]])),
    }
    cfg = {"num_blocks": 1}
    ref = gats_spg.forward(params, data, cfg)
    got = gats_spg.forward_match_only(params, data, cfg)
    np.testing.assert_array_equal(np.asarray(got.matches0),
                                  np.asarray(ref.matches0))
    np.testing.assert_array_equal(np.asarray(got.matches1),
                                  np.asarray(ref.matches1))
    np.testing.assert_allclose(np.asarray(got.matching_scores0),
                               np.asarray(ref.matching_scores0), atol=1e-6)
