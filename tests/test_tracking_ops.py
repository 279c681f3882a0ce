"""LK optical flow vs cv2.calcOpticalFlowPyrLK, and the NN matcher."""
import numpy as np
import pytest

import jax.numpy as jnp

from onepose_tpu.models.nn_matcher import mutual_nearest_neighbour
from onepose_tpu.ops import lk_flow


def make_texture(rng, h=240, w=320):
    """Smooth random texture (LK needs gradients but hates pure noise)."""
    img = rng.uniform(0, 1, (h // 8, w // 8)).astype(np.float32)
    import cv2

    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
    return np.clip(img, 0, 1)


def test_lk_pure_translation():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    im0 = make_texture(rng)
    shift = (7.3, -4.6)
    M = np.float32([[1, 0, shift[0]], [0, 1, shift[1]]])
    im1 = cv2.warpAffine(im0, M, (im0.shape[1], im0.shape[0]))

    pts = rng.uniform([40, 40], [280, 200], (50, 2)).astype(np.float32)
    res = lk_flow.pyramid_lk(
        jnp.asarray(im0), jnp.asarray(im1), jnp.asarray(pts))
    status = np.asarray(res.status)
    tracked = np.asarray(res.points)
    assert status.sum() >= 40
    flow = tracked[status] - pts[status]
    np.testing.assert_allclose(
        np.median(flow, axis=0), shift, atol=0.3)


def test_lk_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    im0 = make_texture(rng)
    M = cv2.getRotationMatrix2D((160, 120), 3.0, 1.02)
    M[:, 2] += [5.0, -3.0]
    im1 = cv2.warpAffine(im0, M, (im0.shape[1], im0.shape[0]))

    pts = rng.uniform([40, 40], [280, 200], (40, 2)).astype(np.float32)
    ours = lk_flow.pyramid_lk(
        jnp.asarray(im0), jnp.asarray(im1), jnp.asarray(pts))

    cv_pts, cv_status, _ = cv2.calcOpticalFlowPyrLK(
        (im0 * 255).astype(np.uint8), (im1 * 255).astype(np.uint8),
        pts[:, None, :], None, winSize=(15, 15), maxLevel=2,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 10,
                  0.03))
    cv_pts = cv_pts[:, 0, :]
    both = np.asarray(ours.status) & (cv_status[:, 0] == 1)
    assert both.sum() >= 25
    diff = np.linalg.norm(np.asarray(ours.points)[both] - cv_pts[both],
                          axis=1)
    assert np.median(diff) < 0.5, np.median(diff)


def test_lk_flat_region_rejected():
    im0 = np.zeros((100, 100), np.float32)
    im1 = np.zeros((100, 100), np.float32)
    pts = np.array([[50.0, 50.0]], np.float32)
    res = lk_flow.pyramid_lk(jnp.asarray(im0), jnp.asarray(im1),
                             jnp.asarray(pts))
    assert not bool(np.asarray(res.status)[0])


def test_nn_matcher_identity():
    rng = np.random.default_rng(2)
    d = rng.normal(size=(32, 64)).astype(np.float32)
    res = mutual_nearest_neighbour(jnp.asarray(d), jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(res.matches0),
                                  np.arange(32))
    np.testing.assert_allclose(np.asarray(res.matching_scores0), 1.0,
                               atol=1e-5)


def test_nn_matcher_thresholds():
    rng = np.random.default_rng(3)
    d0 = rng.normal(size=(16, 64)).astype(np.float32)
    perm = rng.permutation(16)
    d1 = d0[perm] + 0.05 * rng.normal(size=(16, 64)).astype(np.float32)
    res = mutual_nearest_neighbour(
        jnp.asarray(d0), jnp.asarray(d1), distance_thresh=0.8)
    m = np.asarray(res.matches0)
    valid = m >= 0
    assert valid.sum() >= 14
    inv = np.argsort(perm)
    np.testing.assert_array_equal(m[valid], inv[np.where(valid)[0]])


def test_nn_matcher_masks():
    rng = np.random.default_rng(4)
    d0 = rng.normal(size=(8, 32)).astype(np.float32)
    d1 = d0.copy()
    mask1 = np.ones(8, bool)
    mask1[3] = False
    res = mutual_nearest_neighbour(
        jnp.asarray(d0), jnp.asarray(d1), mask1=jnp.asarray(mask1))
    assert np.asarray(res.matches0)[3] != 3


def test_lk_tiny_image_compiles_and_tracks():
    """Regression: when the coarsest pyramid level is smaller than the LK
    window, the patch shrink must also shrink the sampling window —
    previously the fixed (win+1, win+1) dynamic_slice exceeded the patch
    and compilation failed (and for sizes just above win+1 the clip
    bounds inverted)."""
    rng = np.random.default_rng(0)
    tex = make_texture(rng, h=64, w=64)
    im0 = tex[8:56, 8:56]            # 48x48 → coarsest level is 12x12
    im1 = tex[7:55, 6:54]            # true flow (dx, dy) = (+2, +1)
    pts = np.array([[20.0, 24.0], [30.0, 18.0]], np.float32)
    res = lk_flow.pyramid_lk(jnp.asarray(im0), jnp.asarray(im1),
                             jnp.asarray(pts), win=15, levels=3)
    ok = np.asarray(res.status)
    moved = np.asarray(res.points) - pts
    assert ok.any()
    np.testing.assert_allclose(moved[ok],
                               np.tile([2.0, 1.0], (ok.sum(), 1)),
                               atol=0.75)


def test_inv_psd_rejects_non_multiple_of_3():
    from onepose_tpu.ops import epnp as epnp_mod
    with np.testing.assert_raises(ValueError):
        epnp_mod._inv_psd(jnp.eye(4))
