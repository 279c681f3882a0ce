"""Levenberg–Marquardt bundle adjustment, TPU-native.

Replaces the reference's DeepLM C++/CUDA solver
(/root/reference/src/tracker/ba_tracker.py:4,401-407 — ``Solve`` on the
Snavely reprojection residual) and COLMAP's ``bundle_adjuster``
(/root/reference/src/sfm/global_ba.py:9-32) with a JAX implementation:

- static shapes: cameras [C, 6] (angle-axis + translation), points [P, 3],
  observations padded to a fixed budget with a validity mask;
- analytic Jacobians; normal equations reduced by the standard Schur
  complement (per-point 3x3 blocks inverted under vmap, camera system dense
  6C x 6C) — the structure XLA maps well;
- fixed-iteration damped LM under ``lax.scan`` with gain-ratio damping
  updates (no data-dependent Python control flow);
- ``fix_cameras`` / ``fix_points`` flags cover point-only triangulation
  refinement and extrinsics-only "global BA".

fp32 with pixel-unit residuals; solves are regularized Cholesky.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from onepose_tpu.ops import lie
from onepose_tpu.ops.precision import pin_fp32


class BAProblem(NamedTuple):
    """cameras: [C, 6] (w, t); points: [P, 3]; observations:
    cam_idx [O], pt_idx [O], uv [O, 2] pixels, K [O, 4] (fx, fy, cx, cy),
    mask [O]."""

    cameras: jnp.ndarray
    points: jnp.ndarray
    cam_idx: jnp.ndarray
    pt_idx: jnp.ndarray
    uv: jnp.ndarray
    K: jnp.ndarray
    mask: jnp.ndarray


def project_obs(cameras, points, cam_idx, pt_idx, K):
    """Per-observation projection → [O, 2] pixels and depths [O]."""
    cam = cameras[cam_idx]               # [O, 6]
    X = points[pt_idx]                   # [O, 3]
    R = lie.so3_exp(cam[:, :3])          # [O, 3, 3]
    p = jnp.einsum("oij,oj->oi", R, X) + cam[:, 3:6]
    z = p[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    x = p[:, 0] / zs
    y = p[:, 1] / zs
    u = K[:, 0] * x + K[:, 2]
    v = K[:, 1] * y + K[:, 3]
    return jnp.stack([u, v], axis=1), z


def residuals(cameras, points, cam_idx, pt_idx, uv, K, mask):
    pred, _ = project_obs(cameras, points, cam_idx, pt_idx, K)
    return (pred - uv) * mask[:, None]


def _obs_jacobians(cameras, points, cam_idx, pt_idx, K, mask):
    """Analytic per-observation Jacobians. Returns (Jc [O, 2, 6],
    Jp [O, 2, 3], r [O, 2]).

    Camera increment is left-multiplicative: R ← exp(dw) R, t ← exp(dw) t
    + dt (same parameterization as the EPnP Gauss-Newton polish)."""
    cam = cameras[cam_idx]
    X = points[pt_idx]
    R = lie.so3_exp(cam[:, :3])
    p = jnp.einsum("oij,oj->oi", R, X) + cam[:, 3:6]
    z = jnp.where(jnp.abs(p[:, 2]) < 1e-8, 1e-8, p[:, 2])
    iz = 1.0 / z
    iz2 = iz * iz
    fx, fy = K[:, 0], K[:, 1]

    # d(uv)/d(p): [O, 2, 3]
    zero = jnp.zeros_like(iz)
    J_proj = jnp.stack([
        jnp.stack([fx * iz, zero, -fx * p[:, 0] * iz2], axis=-1),
        jnp.stack([zero, fy * iz, -fy * p[:, 1] * iz2], axis=-1),
    ], axis=1)
    # d(p)/d(cam) = [-[p]x | I] : [O, 3, 6]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype),
                           (p.shape[0], 3, 3))
    J_cam = jnp.concatenate([-lie.hat(p), eye], axis=-1)
    # d(p)/d(X) = R
    Jc = jnp.einsum("oij,ojk->oik", J_proj, J_cam)
    Jp = jnp.einsum("oij,ojk->oik", J_proj, R)

    pred_u = fx * p[:, 0] * iz + K[:, 2]
    pred_v = fy * p[:, 1] * iz + K[:, 3]
    r = jnp.stack([pred_u, pred_v], axis=1)
    m = mask[:, None]
    return Jc * m[..., None], Jp * m[..., None], r


class BAResult(NamedTuple):
    cameras: jnp.ndarray
    points: jnp.ndarray
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "fix_cameras", "fix_points",
                     "fix_first_camera"),
)
@pin_fp32
def solve_ba(problem: BAProblem, iterations: int = 10,
             init_lambda: float = 1e-3,
             fix_cameras: bool = False, fix_points: bool = False,
             fix_first_camera: bool = True) -> BAResult:
    """Damped LM with Schur complement. All shapes static."""
    C = problem.cameras.shape[0]
    P = problem.points.shape[0]
    cam_idx = problem.cam_idx
    pt_idx = problem.pt_idx
    uv = problem.uv
    K = problem.K
    mask = problem.mask.astype(jnp.float32)

    def cost(cams, pts):
        r = residuals(cams, pts, cam_idx, pt_idx, uv, K, mask)
        return jnp.sum(r * r)

    def lm_step(cams, pts, lam):
        Jc, Jp, pred = _obs_jacobians(cams, pts, cam_idx, pt_idx, K, mask)
        r = (pred - uv) * mask[:, None]            # [O, 2]

        # Normal-equation blocks via segment sums.
        Hcc_blocks = jnp.einsum("oik,oil->okl", Jc, Jc)     # per-obs 6x6
        Hpp_blocks = jnp.einsum("oik,oil->okl", Jp, Jp)     # per-obs 3x3
        Hcp_blocks = jnp.einsum("oik,oil->okl", Jc, Jp)     # per-obs 6x3
        gc_obs = jnp.einsum("oik,oi->ok", Jc, r)            # [O, 6]
        gp_obs = jnp.einsum("oik,oi->ok", Jp, r)            # [O, 3]

        Hcc = jax.ops.segment_sum(Hcc_blocks, cam_idx, C)   # [C, 6, 6]
        Hpp = jax.ops.segment_sum(Hpp_blocks, pt_idx, P)    # [P, 3, 3]
        gc = jax.ops.segment_sum(gc_obs, cam_idx, C)        # [C, 6]
        gp = jax.ops.segment_sum(gp_obs, pt_idx, P)         # [P, 3]

        # damping
        lam_eye6 = lam * jnp.eye(6)
        lam_eye3 = lam * jnp.eye(3)
        Hpp_d = Hpp + lam_eye3[None] + 1e-8 * jnp.eye(3)[None]
        Hpp_inv = jnp.linalg.inv(Hpp_d)                     # [P, 3, 3]

        if fix_points:
            # camera-only system
            Hcc_full = _to_dense_cams(Hcc, lam_eye6)
            gc_full = gc.reshape(C * 6)
            dc = -_precond_solve(Hcc_full, gc_full)
            dp = jnp.zeros_like(pts)
            return _apply_update(cams, pts, dc.reshape(C, 6), dp,
                                 fix_cameras, fix_points,
                                 fix_first_camera)

        if fix_cameras:
            dp = -jnp.einsum("pij,pj->pi", Hpp_inv, gp)
            return _apply_update(cams, pts, jnp.zeros_like(cams), dp,
                                 fix_cameras, fix_points,
                                 fix_first_camera)

        if fix_first_camera:
            # gauge fix INSIDE the system: a huge prior on camera 0 keeps
            # the reduced system non-singular in fp32 (zeroing dc[0] after
            # the solve would leave the gauge nullspace in the factorization)
            gauge = 1e6 * jnp.max(jnp.abs(Hcc))
            Hcc = Hcc.at[0].add(gauge * jnp.eye(6))

        # Schur complement on cameras:
        # S = Hcc - sum_obs Hcp Hpp^-1 Hpc (pairing obs sharing a point &
        # camera pair through per-obs contributions)
        W = Hcp_blocks                                   # [O, 6, 3]
        Hpp_inv_o = Hpp_inv[pt_idx]                      # [O, 3, 3]
        # per-point aggregation of W per camera requires the cross terms
        # between two cameras seeing the same point; build them via
        # [P, C-block] dense accumulation: Wp[p] = sum over obs of that
        # point stacked per camera — for window BA C is small (<= ~16), so
        # a dense [P, C*6, 3] tensor is affordable and keeps XLA happy.
        Wp = jax.ops.segment_sum(
            _scatter_cam_blocks(W, cam_idx, C), pt_idx, P)  # [P, C6, 3]
        S_corr = jnp.einsum("pax,pxy,pby->pab", Wp, Hpp_inv, Wp)
        S = _to_dense_cams(Hcc, lam_eye6) - jnp.sum(S_corr, axis=0)

        gp_tilde = jnp.einsum("pij,pj->pi", Hpp_inv, gp)    # [P, 3]
        g_corr = jnp.einsum("pax,px->pa", Wp, gp_tilde)     # [P, C6]
        g_schur = gc.reshape(C * 6) - jnp.sum(g_corr, axis=0)

        dc = -_precond_solve(S, g_schur).reshape(C, 6)
        # back-substitute points: dp = -Hpp^-1 (gp + Hpc dc)
        Hpc_dc = jnp.einsum("pax,a->px", Wp, dc.reshape(C * 6))
        dp = -jnp.einsum("pij,pj->pi", Hpp_inv, gp + Hpc_dc)
        return _apply_update(cams, pts, dc, dp, fix_cameras, fix_points,
                             fix_first_camera)

    def step(carry, _):
        cams, pts, lam = carry
        c0 = cost(cams, pts)
        cams_new, pts_new = lm_step(cams, pts, lam)
        c1 = cost(cams_new, pts_new)
        improved = c1 < c0
        cams = jnp.where(improved, cams_new, cams)
        pts = jnp.where(improved, pts_new, pts)
        lam = jnp.where(improved, jnp.maximum(lam * 0.5, 1e-8),
                        jnp.minimum(lam * 4.0, 1e6))
        return (cams, pts, lam), c1

    c_init = cost(problem.cameras, problem.points)
    (cams, pts, _), costs = jax.lax.scan(
        step, (problem.cameras, problem.points,
               jnp.float32(init_lambda)), None, length=iterations)
    return BAResult(cams, pts, c_init, cost(cams, pts))


def _precond_solve(A, b):
    """Jacobi-preconditioned solve with one iterative-refinement step: fp32
    normal equations square the condition number; scaling by diag(A)^-1/2 +
    refinement recovers most of the lost digits."""
    d = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(A), 1e-12))
    A_s = A * d[:, None] * d[None, :]
    b_s = b * d
    cho = jax.scipy.linalg.cho_factor(A_s)
    y = jax.scipy.linalg.cho_solve(cho, b_s)
    # iterative refinement (residual in fp32; factorization error dominates)
    resid = b_s - A_s @ y
    y = y + jax.scipy.linalg.cho_solve(cho, resid)
    return y * d


def _scatter_cam_blocks(W, cam_idx, C):
    """[O, 6, 3] → [O, C*6, 3] with each obs's block placed at its camera
    slot (one-hot matmul; O(C) memory per obs, fine for window BA)."""
    onehot = jax.nn.one_hot(cam_idx, C, dtype=W.dtype)      # [O, C]
    return jnp.einsum("oc,oax->ocax", onehot, W).reshape(
        W.shape[0], C * 6, 3)


def _to_dense_cams(Hcc, lam_eye6):
    """[C, 6, 6] block-diagonal → dense [C*6, C*6] with damping."""
    C = Hcc.shape[0]
    H = Hcc + lam_eye6[None] + 1e-8 * jnp.eye(6)[None]
    return jax.scipy.linalg.block_diag(*[H[i] for i in range(C)])


def _apply_update(cams, pts, dc, dp, fix_cameras, fix_points,
                  fix_first_camera):
    if fix_first_camera and not fix_cameras:
        dc = dc.at[0].set(0.0)
    if fix_cameras:
        cams_new = cams
    else:
        w_new = jax.vmap(
            lambda dwi, cami: lie.so3_log(
                lie.so3_exp(dwi) @ lie.so3_exp(cami[:3])))(
                    dc[:, :3], cams)
        t_new = jnp.einsum(
            "cij,cj->ci", lie.so3_exp(dc[:, :3]), cams[:, 3:6]) \
            + dc[:, 3:6]
        cams_new = jnp.concatenate([w_new, t_new], axis=1)
    pts_new = pts if fix_points else pts + dp
    return cams_new, pts_new


# ---------------------------------------------------------------------------
# Convenience wrappers
# ---------------------------------------------------------------------------

def pose_to_camera(pose, dtype=jnp.float32):
    """[3, 4] or [4, 4] world→camera pose → [6] (angle-axis, t)."""
    pose = jnp.asarray(pose, dtype)
    w = lie.so3_log(pose[:3, :3])
    return jnp.concatenate([w, pose[:3, 3]])


def camera_to_pose(cam):
    """[6] → [3, 4]."""
    R = lie.so3_exp(cam[:3])
    return jnp.concatenate([R, cam[3:6, None]], axis=1)
