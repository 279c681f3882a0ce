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


@pytest.mark.slow
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


@pytest.mark.slow
def test_demo_apply_tracking_drives_poses():
    """The demo CLI's tracking flow: frame 0 seeds a keyframe (PnP pose);
    later frames' poses must come from the tracker and stay within the
    1.5 cm / 1.5 deg synthetic-sequence tolerance."""
    import sys
    import os.path as osp

    sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
    import jax.numpy as jnp

    from inference_demo import apply_tracking
    from onepose_tpu.pipeline import PoseOutput

    rng = np.random.default_rng(2)
    K, pts3d, frames = make_plane_sequence(rng)
    n = len(pts3d)

    def fake_out(fr):
        z = jnp.zeros(1)
        return PoseOutput(
            poses=jnp.asarray(fr["pose"])[None],
            num_inliers=z, num_matches=z, success=jnp.ones(1, bool),
            matches0=jnp.arange(n)[None],
            keypoints2d=jnp.asarray(fr["keypoints"])[None],
            descriptors2d=jnp.asarray(fr["descriptors"])[None],
            kpt_mask=jnp.ones((1, n), bool))

    tracker = BATracker(win_size=6, pnp_hypotheses=128, ba_iterations=6)
    pose0, src0 = apply_tracking(
        tracker, pts3d, frames[0]["image"], K, fake_out(frames[0]), 0,
        frames[0]["pose"])
    assert src0 == "pnp" and len(tracker.frames) == 1

    for i in (1, 2, 3):
        # perturbed PnP pose: if the tracker is live, the final pose must
        # NOT be the PnP input
        pnp_pose = frames[i]["pose"].copy()
        pnp_pose[:3, 3] += 0.003
        pose, src = apply_tracking(
            tracker, pts3d, frames[i]["image"], K, fake_out(frames[i]), i,
            pnp_pose)
        assert src.startswith("track:"), (i, src)
        assert not np.allclose(pose, pnp_pose)
        r_err, t_err = geo.query_pose_error(pose, frames[i]["pose"])
        assert r_err < 1.5 and t_err < 1.5, (i, r_err, t_err)


def test_demo_apply_tracking_pnp_fallback():
    """With an empty tracker and a failed PnP pose, the flow must return
    the PnP result unchanged and not crash."""
    import sys
    import os.path as osp

    sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
    import jax.numpy as jnp

    from inference_demo import apply_tracking
    from onepose_tpu.pipeline import PoseOutput

    n = 16
    out = PoseOutput(
        poses=jnp.zeros((1, 3, 4)), num_inliers=jnp.zeros(1),
        num_matches=jnp.zeros(1), success=jnp.zeros(1, bool),
        matches0=-jnp.ones((1, n), jnp.int32),
        keypoints2d=jnp.zeros((1, n, 2)),
        descriptors2d=jnp.zeros((1, n, 8)),
        kpt_mask=jnp.zeros((1, n), bool))
    tracker = BATracker()
    pose, src = apply_tracking(
        tracker, np.zeros((4, 3)), np.zeros((32, 32), np.float32),
        np.eye(3), out, 0, None)
    assert pose is None and src == "pnp"
    assert len(tracker.frames) == 0


def test_motion_prediction_fallback():
    tracker = BATracker()
    p0 = np.eye(4)[:3]
    p1 = np.eye(4)[:3].copy()
    p1[:3, 3] = [0.01, 0, 0]
    tracker.pose_history = [p0, p1]
    pred = tracker.motion_prediction()
    np.testing.assert_allclose(pred[:3, 3], [0.02, 0, 0], atol=1e-6)


def test_track_static_shapes_no_retrace():
    """The fused per-frame kernels must not retrace when the number of
    valid keypoints/matches changes between frames — that is the point of
    the static-shape redesign (each distinct count used to recompile)."""
    from onepose_tpu import tracker as trk

    rng = np.random.default_rng(3)
    K, pts3d, frames = make_plane_sequence(rng, n_frames=4, n_points=60)
    n = len(pts3d)
    budget = 96

    def pad(fr, n_valid):
        kp = np.zeros((budget, 2), np.float32)
        kp[:n] = fr["keypoints"]
        ds = np.ones((budget, 64), np.float32)
        ds[:n] = fr["descriptors"]
        mask = np.zeros(budget, bool)
        mask[:n_valid] = True
        return kp, ds, mask

    tracker = BATracker(win_size=4, pnp_hypotheses=64, ba_iterations=2)
    kp, ds, mask = pad(frames[0], n)
    assert tracker.add_keyframe(frames[0]["image"], kp, ds, mask,
                                frames[0]["pose"], K,
                                mkpts3d=pts3d, kpt_indices=np.arange(n))

    step0 = trk._track_step._cache_size()
    # vary the valid-keypoint count per frame: the masks change, the
    # shapes do not
    for i, n_valid in ((1, n), (2, n - 7), (3, n - 13)):
        kp, ds, mask = pad(frames[i], n_valid)
        tracker.track(frames[i]["image"], kp, ds, mask, K)
    assert trk._track_step._cache_size() - step0 <= 1


def test_uint8_image_path_bit_identical():
    """uint8 frames upload 1 byte/px and normalize on device
    (tracker._img_unit_f32); the result must be BIT-identical to feeding
    the host-converted f32 image (u/255) — device astype+div of exact
    uint8 values is the same IEEE f32 computation."""
    rng = np.random.default_rng(7)
    K, pts3d, frames = make_plane_sequence(rng, n_frames=3)
    n = len(pts3d)

    def run(as_uint8):
        tracker = BATracker(win_size=4, pnp_hypotheses=64,
                            ba_iterations=2, seed=5)
        poses = []
        for i, fr in enumerate(frames):
            u8 = np.clip(np.round(fr["image"] * 255.0), 0,
                         255).astype(np.uint8)
            img = u8 if as_uint8 else u8.astype(np.float32) / np.float32(
                255.0)
            if i == 0:
                assert tracker.add_keyframe(
                    img, fr["keypoints"], fr["descriptors"],
                    np.ones(n, bool), fr["pose"], K,
                    mkpts3d=pts3d, kpt_indices=np.arange(n))
            else:
                pose, info = tracker.track(
                    img, fr["keypoints"], fr["descriptors"],
                    np.ones(n, bool), K)
                assert pose is not None, (i, info)
                poses.append(pose)
        return poses

    for p_u8, p_f32 in zip(run(True), run(False)):
        np.testing.assert_array_equal(p_u8, p_f32)


@pytest.mark.slow
def test_fused_triangulation_registers_new_points():
    """A keyframe whose keypoints only PARTIALLY carry 3D ids must grow
    the map through the fused step's two-view triangulation: the
    unassigned KF↔query matches get DLT'd in-dispatch, survive the
    reproj/depth culling, and are registered as free (BA-refinable)
    points visible to the next window solve."""
    rng = np.random.default_rng(7)
    K, pts3d, frames = make_plane_sequence(rng, n_frames=3, n_points=60)
    n = len(pts3d)
    n_known = n // 2

    tracker = BATracker(win_size=4, pnp_hypotheses=128, ba_iterations=4)
    assert tracker.add_keyframe(
        frames[0]["image"], frames[0]["keypoints"],
        frames[0]["descriptors"], np.ones(n, bool), frames[0]["pose"], K,
        mkpts3d=pts3d[:n_known], kpt_indices=np.arange(n_known))
    assert len(tracker.points3d) == n_known

    pose, info = tracker.track(
        frames[1]["image"], frames[1]["keypoints"],
        frames[1]["descriptors"], np.ones(n, bool), K)
    assert pose is not None, info
    n_new = len(tracker.points3d) - n_known
    assert n_new > 10, "triangulation registered too few new points"
    # new points are free (refinable), DB points stay fixed
    assert tracker.point_fixed[:n_known].all()
    assert not tracker.point_fixed[n_known:].any()
    # triangulated coords must be near the true plane points: the ids
    # registered on the keyframe identify which ground-truth point each
    # new map point corresponds to
    kf = tracker.frames[0]
    src = np.where(kf.point_ids >= n_known)[0]
    assert len(src) == n_new
    # bound is set by the 0.3 px keypoint noise amplified by the small
    # frame0→frame1 baseline (~3 cm at 0.5 m depth), not by the solver
    err = np.abs(tracker.points3d[kf.point_ids[src]] - pts3d[src])
    assert err.max() < 0.05, err.max()
    assert np.median(err) < 0.01, np.median(err)
    # the next tracked frame must associate against the grown map
    pose2, info2 = tracker.track(
        frames[2]["image"], frames[2]["keypoints"],
        frames[2]["descriptors"], np.ones(n, bool), K)
    assert pose2 is not None
    assert info2["num_tracked"] > n_known, info2
    r_err, t_err = geo.query_pose_error(pose2, frames[2]["pose"])
    assert r_err < 1.5 and t_err < 1.5, (r_err, t_err)


def test_track_step_unmatched_sentinel_drops():
    """Regression: invalid keyframe slots must scatter NOWHERE. A -1
    sentinel wraps to query slot nq-1 under mode="drop" (JAX normalizes
    negative indices before the OOB check), spuriously assigning that
    slot a garbage 3D point on every tracked frame."""
    import jax.numpy as jnp
    from onepose_tpu import tracker as trk

    rng = np.random.default_rng(7)
    nk, nq = 24, 16
    img = rng.uniform(0, 1, (64, 64)).astype(np.float32)
    kf_kpts = rng.uniform(10, 54, (nk, 2)).astype(np.float32)
    q_kpts = rng.uniform(10, 54, (nq, 2)).astype(np.float32)
    # orthogonal one-hot descriptor blocks that share no dimensions:
    # mutual NN finds zero matches, so every keyframe slot is unmatched
    kf_desc = np.zeros((nk, 64), np.float32)
    kf_desc[np.arange(nk), np.arange(nk)] = 1.0
    q_desc = np.zeros((nq, 64), np.float32)
    q_desc[np.arange(nq), 32 + np.arange(nq)] = 1.0
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]], np.float32)
    pose_id = np.eye(4, dtype=np.float32)[:3]

    out = trk._unpack_track(np.asarray(trk._track_step(
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(kf_kpts),
        jnp.asarray(kf_desc), jnp.ones(nk, bool), jnp.ones(nk, bool),
        jnp.asarray(rng.normal(size=(nk, 3)).astype(np.float32)),
        jnp.asarray(q_kpts), jnp.asarray(q_desc), jnp.ones(nq, bool),
        jnp.asarray(pose_id), jnp.asarray(True), jnp.asarray(K),
        jnp.asarray(K @ pose_id), __import__("jax").random.PRNGKey(0),
        num_hypotheses=32, gate_scale=1.2)), nk, nq)
    _, m0, keep, n_keep, *_ = out
    assert int(np.sum(m0 >= 0)) == 0           # no mutual matches
    assert int(n_keep) == 0                     # nothing assigned...
    assert not bool(keep[nq - 1])               # ...especially not slot nq-1


def test_tri_two_view_exact_recovery():
    """The fused two-view DLT must recover noise-free 3D points exactly
    and report near-zero reprojection error / correct depths."""
    import jax.numpy as jnp
    from onepose_tpu import tracker as trk

    rng = np.random.default_rng(3)
    n = 32
    pts3d = rng.uniform(-0.15, 0.15, (n, 3)).astype(np.float32)
    K = np.array([[300.0, 0, 160], [0, 300.0, 160], [0, 0, 1]], np.float32)
    R0 = geo.rodrigues([0.2, 0.0, 0.0])
    R1 = geo.rodrigues([0.35, 0.12, 0.02])
    pose0 = np.concatenate([R0, [[0.0], [0.0], [0.5]]], axis=1)
    pose1 = np.concatenate([R1, [[0.02], [-0.01], [0.52]]], axis=1)
    uv0 = geo.project_points(pts3d, K, pose0).astype(np.float32)
    uv1 = geo.project_points(pts3d, K, pose1).astype(np.float32)

    xyz, err, z = trk._tri_two_view(
        jnp.asarray(uv0), jnp.asarray(uv1),
        jnp.asarray((K @ pose0).astype(np.float32)),
        jnp.asarray((K @ pose1).astype(np.float32)))
    assert np.abs(np.asarray(xyz) - pts3d).max() < 2e-3
    assert np.asarray(err).max() < 0.1
    assert (np.asarray(z) > 0.2).all()
