"""BA tracker on a synthetic textured-plane sequence: LK flow + NN matching
+ PnP + windowed BA must hold pose accuracy over the sequence."""
import numpy as np
import pytest

from onepose_tpu.tracker import BATracker
from onepose_tpu.utils import geometry as geo

cv2 = pytest.importorskip("cv2")


def make_plane_sequence(rng, n_frames=4, n_points=60, hw=320):
    """Object = textured plane z=0 (object frame, metric units). Camera
    images are exact homography warps of the texture; keypoints are the
    projected plane points with stable per-point descriptors."""
    K = np.array([[300.0, 0, hw / 2], [0, 300.0, hw / 2], [0, 0, 1]])
    # texture covers plane [-0.2, 0.2]^2 at 1000 px/m
    tex_res = 400
    tex = cv2.resize(
        rng.uniform(0, 1, (50, 50)).astype(np.float32),
        (tex_res, tex_res), interpolation=cv2.INTER_CUBIC)
    scale = tex_res / 0.4  # px per meter
    # plane coords (x, y) → texture pixel: (x + 0.2) * scale
    T_plane = np.array([[scale, 0, 0.2 * scale],
                        [0, scale, 0.2 * scale],
                        [0, 0, 1]])

    pts3d = np.concatenate([
        rng.uniform(-0.15, 0.15, (n_points, 2)),
        np.zeros((n_points, 1))], axis=1)
    descs = rng.normal(size=(n_points, 64)).astype(np.float32)

    frames = []
    for i in range(n_frames):
        angle = 0.25 + 0.06 * i
        R = geo.rodrigues([angle, 0.1 * i, 0.02 * i])
        t = np.array([0.01 * i, -0.005 * i, 0.5])
        pose = np.concatenate([R, t[:, None]], axis=1)
        # homography plane→image: K [r1 r2 t]
        H_img = K @ np.stack([R[:, 0], R[:, 1], t], axis=1)
        H = H_img @ np.linalg.inv(T_plane)
        img = cv2.warpPerspective(tex, H.astype(np.float32), (hw, hw))
        uv = geo.project_points(pts3d, K, pose)
        noise = rng.normal(size=uv.shape) * 0.3
        frames.append({
            "image": img,
            "pose": pose,
            "keypoints": (uv + noise).astype(np.float32),
            "descriptors": descs + 0.02 * rng.normal(
                size=descs.shape).astype(np.float32),
        })
    return K, pts3d, frames


def test_tracker_sequence():
    rng = np.random.default_rng(0)
    K, pts3d, frames = make_plane_sequence(rng)
    n = len(pts3d)

    tracker = BATracker(win_size=6, pnp_hypotheses=128, ba_iterations=6)
    ok = tracker.add_keyframe(
        frames[0]["image"], frames[0]["keypoints"],
        frames[0]["descriptors"], np.ones(n, bool), frames[0]["pose"], K,
        mkpts3d=pts3d, kpt_indices=np.arange(n))
    assert ok

    for i in (1, 2, 3):
        pose, info = tracker.track(
            frames[i]["image"], frames[i]["keypoints"],
            frames[i]["descriptors"], np.ones(n, bool), K)
        assert pose is not None, (i, info)
        r_err, t_err = geo.query_pose_error(pose, frames[i]["pose"])
        assert r_err < 1.5 and t_err < 1.5, (i, r_err, t_err, info)
        assert info["num_tracked"] >= 30, info


def test_keyframe_gating():
    rng = np.random.default_rng(1)
    K, pts3d, frames = make_plane_sequence(rng, n_frames=2)
    n = len(pts3d)
    tracker = BATracker()
    assert tracker.add_keyframe(
        frames[0]["image"], frames[0]["keypoints"],
        frames[0]["descriptors"], np.ones(n, bool), frames[0]["pose"], K,
        mkpts3d=pts3d, kpt_indices=np.arange(n))
    # a wildly different pose must be rejected (10 cm / 10 deg gate)
    bad_pose = frames[0]["pose"].copy()
    bad_pose[:3, 3] += [0.5, 0, 0]
    assert not tracker.add_keyframe(
        frames[1]["image"], frames[1]["keypoints"],
        frames[1]["descriptors"], np.ones(n, bool), bad_pose, K)


def test_motion_prediction_fallback():
    tracker = BATracker()
    p0 = np.eye(4)[:3]
    p1 = np.eye(4)[:3].copy()
    p1[:3, 3] = [0.01, 0, 0]
    tracker.pose_history = [p0, p1]
    pred = tracker.motion_prediction()
    np.testing.assert_allclose(pred[:3, 3], [0.02, 0, 0], atol=1e-6)
