"""Unit tests for host-side geometry: crop/K math against closed-form cases
and cv2 cross-checks (behavioral contract of the reference's
data_utils.py:24-272)."""
import numpy as np
import pytest

from onepose_tpu.utils import geometry as geo


def test_affine_transform_maps_box_to_output():
    # A box cropped to (resize_w, resize_h) must map box center -> output
    # center and scale by resize_w / box_w.
    box = [10.0, 20.0, 110.0, 70.0]  # w=100, h=50
    resize = (256, 256)  # h, w
    center = np.array([60.0, 45.0])
    trans = geo.get_affine_transform(
        center, np.array([100.0, 50.0]), 0, [256, 256]
    )
    c_out = trans @ np.array([60.0, 45.0, 1.0])
    np.testing.assert_allclose(c_out, [128.0, 128.0], atol=1e-9)
    # uniform scale = 256/100
    p_out = trans @ np.array([110.0, 45.0, 1.0])
    np.testing.assert_allclose(p_out, [128.0 + 50 * 2.56, 128.0], atol=1e-9)


def test_affine_transform_matches_cv2_three_point():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    for rot in [0.0, 15.0, -40.0]:
        center = rng.uniform(50, 200, 2)
        scale = rng.uniform(40, 160, 2)
        out_size = [128, 96]
        ours = geo.get_affine_transform(center, scale, rot, out_size)

        # Independent construction: three corresponding points under the
        # similarity model (center->center, rotated top edge).
        theta = np.pi * rot / 180
        sn, cs = np.sin(theta), np.cos(theta)
        src_dir = np.array([-scale[0] * 0.5 * -sn * -1, 0]) if False else \
            np.array([0 * cs - (-scale[0] * 0.5) * sn,
                      0 * sn + (-scale[0] * 0.5) * cs])
        dst_dir = np.array([0, -out_size[0] * 0.5])
        src = np.zeros((3, 2), np.float32)
        dst = np.zeros((3, 2), np.float32)
        src[0] = center
        src[1] = center + src_dir
        d = src[0] - src[1]
        src[2] = src[1] + np.array([-d[1], d[0]])
        dst[0] = [out_size[0] * 0.5, out_size[1] * 0.5]
        dst[1] = dst[0] + dst_dir
        d2 = dst[0] - dst[1]
        dst[2] = dst[1] + np.array([-d2[1], d2[0]])
        ref = cv2.getAffineTransform(src, dst)
        np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_affine_inverse_roundtrip():
    center = np.array([60.0, 45.0])
    scale = np.array([100.0, 50.0])
    fwd = geo.get_affine_transform(center, scale, 30.0, [256, 256])
    inv = geo.get_affine_transform(center, scale, 30.0, [256, 256], inv=True)
    pts = np.random.default_rng(1).uniform(0, 200, (5, 2))
    pts_h = np.concatenate([pts, np.ones((5, 1))], axis=1)
    round_trip = (inv @ np.concatenate(
        [(fwd @ pts_h.T).T, np.ones((5, 1))], axis=1).T).T
    np.testing.assert_allclose(round_trip, pts, atol=1e-6)


def test_K_crop_consistency():
    # Projecting a 3D point with K_crop must equal crop-transforming the
    # original projection.
    K = np.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]])
    box = [100, 80, 420, 400]
    K_crop, _ = geo.get_K_crop_resize(box, K, [512, 512])

    pt_cam = np.array([0.1, -0.2, 1.5])
    uv = (K @ pt_cam)[:2] / pt_cam[2]
    uv_crop = (K_crop @ pt_cam)[:2] / pt_cam[2]

    center = np.array([(box[0] + box[2]) / 2, (box[1] + box[3]) / 2])
    scale = np.array([box[2] - box[0], box[3] - box[1]])
    trans = geo.get_affine_transform(center, scale, 0, [512, 512])
    uv_expected = trans @ np.array([uv[0], uv[1], 1.0])
    np.testing.assert_allclose(uv_crop, uv_expected, atol=1e-9)


def test_quaternion_roundtrip():
    rng = np.random.default_rng(2)
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = geo.qvec2rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)
        q2 = geo.rotmat2qvec(R)
        np.testing.assert_allclose(q2, q, atol=1e-9)


def test_rodrigues_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    for _ in range(10):
        rvec = rng.normal(size=3)
        ours = geo.rodrigues(rvec)
        ref = cv2.Rodrigues(rvec)[0]
        np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_pose_error_identity():
    pose = np.eye(4)
    r, t = geo.query_pose_error(pose, pose)
    assert r < 1e-6 and t < 1e-9


def test_pose_error_known():
    gt = np.eye(4)
    pred = np.eye(4)
    pred[:3, 3] = [0.03, 0.04, 0.0]  # 5 cm
    theta = np.deg2rad(10)
    pred[:3, :3] = geo.rodrigues([0, 0, theta])
    r, t = geo.query_pose_error(pred, gt)
    np.testing.assert_allclose(t, 5.0, atol=1e-9)
    np.testing.assert_allclose(r, 10.0, atol=1e-9)


def test_aggregate_metrics():
    m = {"R_errs": [0.5, 2.0, 10.0], "t_errs": [0.5, 2.0, 1.0]}
    agg = geo.aggregate_metrics(m)
    np.testing.assert_allclose(agg["1cm@1degree"], 1 / 3)
    np.testing.assert_allclose(agg["3cm@3degree"], 2 / 3)
    np.testing.assert_allclose(agg["5cm@5degree"], 2 / 3)
