"""Similarity RANSAC vs cv2.estimateAffinePartial2D, and detector behavior
on synthetic warped scenes."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onepose_tpu.ops import similarity


def make_pairs(rng, n=100, scale=1.3, theta=0.4, t=(20.0, -10.0),
               noise=0.5, outlier_frac=0.0, n_valid=None):
    src = rng.uniform(0, 400, (n, 2)).astype(np.float32)
    c, s = np.cos(theta), np.sin(theta)
    A = scale * np.array([[c, -s], [s, c]], np.float32)
    dst = src @ A.T + np.asarray(t, np.float32)
    dst += rng.normal(size=dst.shape).astype(np.float32) * noise
    n_out = int(n * outlier_frac)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        dst[idx] = rng.uniform(0, 400, (n_out, 2))
    mask = np.zeros(n, bool)
    mask[: n_valid if n_valid is not None else n] = True
    return src, dst, mask, A, np.asarray(t, np.float32)


def test_similarity_exact():
    rng = np.random.default_rng(0)
    src, dst, mask, A_gt, t_gt = make_pairs(rng, noise=0.0)
    res = similarity.ransac_similarity(
        jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(res.A), A_gt, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=0.5)
    assert res.num_inliers == 100


def test_similarity_outliers():
    rng = np.random.default_rng(1)
    src, dst, mask, A_gt, t_gt = make_pairs(
        rng, noise=0.5, outlier_frac=0.4)
    res = similarity.ransac_similarity(
        jax.random.PRNGKey(1), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(res.A), A_gt, atol=0.02)
    np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=3.0)
    assert res.num_inliers >= 50


def test_similarity_vs_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(2)
    for trial in range(5):
        src, dst, mask, A_gt, t_gt = make_pairs(
            rng, noise=1.0, outlier_frac=0.3,
            theta=float(rng.uniform(-1, 1)))
        res = similarity.ransac_similarity(
            jax.random.PRNGKey(trial), jnp.asarray(src), jnp.asarray(dst),
            jnp.asarray(mask))
        M, _ = cv2.estimateAffinePartial2D(
            src, dst, ransacReprojThreshold=6)
        ours = np.concatenate(
            [np.asarray(res.A), np.asarray(res.t)[:, None]], axis=1)
        err_ours = np.abs(
            ours - np.concatenate([A_gt, t_gt[:, None]], 1)).max()
        err_cv = np.abs(
            M - np.concatenate([A_gt, t_gt[:, None]], 1)).max()
        assert err_ours <= err_cv * 2 + 0.5, (trial, err_ours, err_cv)


def test_similarity_degenerate():
    """Fewer than 2 valid points → no success, identity-ish output."""
    src = np.zeros((8, 2), np.float32)
    dst = np.zeros((8, 2), np.float32)
    mask = np.zeros(8, bool)
    mask[0] = True
    res = similarity.ransac_similarity(
        jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(mask))
    assert not bool(res.success)
    assert int(res.num_inliers) == 0


def test_similarity_irls_collapse_guard():
    """If an IRLS iteration yields < 2 inliers, the carry must keep the
    previous valid model rather than refit on uniform ~0 weights over all
    correspondences (ADVICE r4: inlier-set collapse monotone-safety).

    Construction: 3 exact inliers of a known similarity among many wild
    outliers (3 > the count-2 any exact-fit outlier pair gets, so the
    winner is unambiguous), with a tight threshold. The result must be
    the winner's model, never identity (the pre-fix init carry) or a
    garbage outlier-inclusive fit."""
    rng = np.random.default_rng(7)
    A_gt = 1.2 * np.array([[np.cos(0.3), -np.sin(0.3)],
                           [np.sin(0.3), np.cos(0.3)]], np.float32)
    t_gt = np.array([15.0, -5.0], np.float32)
    n = 32
    src = rng.uniform(0, 400, (n, 2)).astype(np.float32)
    dst = rng.uniform(2000, 4000, (n, 2)).astype(np.float32)  # wild
    dst[:3] = src[:3] @ A_gt.T + t_gt                         # 3 exact
    mask = np.ones(n, bool)
    res = similarity.ransac_similarity(
        jax.random.PRNGKey(3), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(mask), threshold=0.5, num_hypotheses=4096)
    assert bool(res.success)
    assert int(res.num_inliers) >= 3
    np.testing.assert_allclose(np.asarray(res.A), A_gt, atol=1e-2)
    np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=1.0)


def test_crop_img_by_bbox_K_consistency():
    """The two-stage crop must keep reprojection consistent with K_crop."""
    from onepose_tpu.detector import crop_img_by_bbox
    from onepose_tpu.utils import geometry as geo

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (480, 640)).astype(np.float32)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    bbox = [100, 60, 420, 380]
    crop, K_crop = crop_img_by_bbox(img, bbox, K, crop_size=512)
    assert crop.shape == (512, 512)

    # a camera-frame point projecting inside the box must land at the
    # transformed position under K_crop
    pt_cam = np.array([0.0, 0.05, 1.0])
    uv_full = (K @ pt_cam)[:2] / pt_cam[2]
    assert bbox[0] < uv_full[0] < bbox[2]
    uv_crop = (K_crop @ pt_cam)[:2] / pt_cam[2]
    # manual: full → stage1 (box at native res) → stage2 (resize to 512)
    sx = 512 / (bbox[2] - bbox[0])
    expected = (uv_full - [bbox[0], bbox[1]]) * sx
    np.testing.assert_allclose(uv_crop, expected, atol=1e-6)
