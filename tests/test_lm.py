"""LM bundle adjustment: convergence on synthetic windows, fixed-cameras /
fixed-points modes, masked padding."""
import numpy as np

import jax.numpy as jnp

from onepose_tpu.ops import lie, lm
from onepose_tpu.utils import geometry as geo


def make_ba_problem(rng, n_cams=6, n_pts=50, noise_px=0.5,
                    cam_noise=0.02, pt_noise=0.005, pad_obs=0):
    K = np.array([460.0, 460.0, 256.0, 256.0], np.float32)
    pts_gt = rng.uniform(-0.1, 0.1, (n_pts, 3)).astype(np.float32)

    cams_gt = []
    for i in range(n_cams):
        theta = 2 * np.pi * i / n_cams
        center = np.array([0.5 * np.cos(theta), 0.5 * np.sin(theta), 0.3])
        z = -center / np.linalg.norm(center)
        up = np.array([0.0, 0.0, 1.0])
        x = np.cross(z, up)
        x /= np.linalg.norm(x)
        R = np.stack([x, np.cross(z, x), z])
        t = -R @ center
        w = np.asarray(lie.so3_log(jnp.asarray(R, jnp.float32)))
        cams_gt.append(np.concatenate([w, t]).astype(np.float32))
    cams_gt = np.stack(cams_gt)

    cam_idx, pt_idx, uvs = [], [], []
    for ci in range(n_cams):
        pose = np.asarray(lm.camera_to_pose(jnp.asarray(cams_gt[ci])))
        uv = geo.project_points(
            pts_gt, np.array([[K[0], 0, K[2]], [0, K[1], K[3]],
                              [0, 0, 1]]), pose)
        uv += rng.normal(size=uv.shape) * noise_px
        cam_idx += [ci] * n_pts
        pt_idx += list(range(n_pts))
        uvs += list(uv)
    O = len(cam_idx)
    mask = np.ones(O + pad_obs, bool)
    mask[O:] = False

    problem = lm.BAProblem(
        cameras=jnp.asarray(np.stack([
            c + np.concatenate([rng.normal(size=3) * cam_noise,
                                rng.normal(size=3) * cam_noise])
            for c in cams_gt]).astype(np.float32)),
        points=jnp.asarray(
            pts_gt + rng.normal(size=pts_gt.shape).astype(np.float32)
            * pt_noise),
        cam_idx=jnp.asarray(np.concatenate(
            [cam_idx, np.zeros(pad_obs, int)]).astype(np.int32)),
        pt_idx=jnp.asarray(np.concatenate(
            [pt_idx, np.zeros(pad_obs, int)]).astype(np.int32)),
        uv=jnp.asarray(np.concatenate(
            [np.stack(uvs),
             np.zeros((pad_obs, 2))]).astype(np.float32)),
        K=jnp.broadcast_to(jnp.asarray(K), (O + pad_obs, 4)),
        mask=jnp.asarray(mask),
    )
    return problem, cams_gt, pts_gt


def test_ba_converges():
    rng = np.random.default_rng(0)
    problem, cams_gt, pts_gt = make_ba_problem(rng)
    res = lm.solve_ba(problem, iterations=15)
    assert float(res.final_cost) < float(res.initial_cost) * 0.05
    # camera poses close to GT (first camera gauge-fixed; compare relative
    # reprojection quality instead of absolute params)
    r = np.asarray(lm.residuals(
        res.cameras, res.points, problem.cam_idx, problem.pt_idx,
        problem.uv, problem.K, problem.mask.astype(jnp.float32)))
    rms = np.sqrt((r ** 2).sum() / problem.mask.sum())
    assert rms < 1.0, rms  # down to the noise floor


def test_ba_fix_points():
    """Extrinsics-only refinement (the reference's global_ba mode)."""
    rng = np.random.default_rng(1)
    problem, cams_gt, pts_gt = make_ba_problem(
        rng, cam_noise=0.01, pt_noise=0.0, noise_px=0.0)
    res = lm.solve_ba(problem, iterations=15, fix_points=True,
                      fix_first_camera=False)
    np.testing.assert_allclose(
        np.asarray(res.points), np.asarray(problem.points))
    assert float(res.final_cost) < float(res.initial_cost) * 1e-3


def test_ba_fix_cameras():
    """Point-only refinement."""
    rng = np.random.default_rng(2)
    problem, cams_gt, pts_gt = make_ba_problem(
        rng, cam_noise=0.0, pt_noise=0.01, noise_px=0.0)
    res = lm.solve_ba(problem, iterations=15, fix_cameras=True)
    np.testing.assert_allclose(
        np.asarray(res.cameras), np.asarray(problem.cameras))
    d = np.linalg.norm(np.asarray(res.points) - pts_gt, axis=1)
    assert np.median(d) < 1e-3


def test_ba_masked_padding():
    rng = np.random.default_rng(3)
    p1, _, _ = make_ba_problem(rng, pad_obs=0)
    rng = np.random.default_rng(3)
    p2, _, _ = make_ba_problem(rng, pad_obs=64)
    r1 = lm.solve_ba(p1, iterations=8)
    r2 = lm.solve_ba(p2, iterations=8)
    np.testing.assert_allclose(np.asarray(r1.cameras),
                               np.asarray(r2.cameras), atol=1e-4)
    np.testing.assert_allclose(np.asarray(r1.points),
                               np.asarray(r2.points), atol=1e-5)


def test_pose_camera_roundtrip():
    rng = np.random.default_rng(4)
    for _ in range(5):
        R = geo.rodrigues(rng.normal(size=3))
        t = rng.normal(size=3)
        pose = np.concatenate([R, t[:, None]], axis=1).astype(np.float32)
        cam = lm.pose_to_camera(pose)
        pose2 = np.asarray(lm.camera_to_pose(cam))
        np.testing.assert_allclose(pose2, pose, atol=1e-5)
