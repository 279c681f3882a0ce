"""Batched on-device RANSAC-EPnP pose solver.

Replaces the reference's host-side ``cv2.solvePnPRansac(..., EPnP, 5px,
10000 iters)`` (/root/reference/src/utils/eval_utils.py:18-42) with a fully
on-device solver so the frame→pose path never leaves HBM:

- hypotheses are evaluated *in parallel* (vmapped minimal EPnP solves over a
  static hypothesis budget) instead of OpenCV's sequential early-exit loop;
- all shapes are static: correspondences arrive as fixed-size arrays with a
  validity mask; degenerate hypotheses simply score zero inliers;
- the winning hypothesis is refined by a weighted EPnP solve on its inlier
  set plus a fixed-iteration Gauss–Newton polish on SE(3) (reprojection
  objective), which matches-or-beats OpenCV's refine-on-inliers behavior;
- math runs in normalized camera coordinates for fp32 conditioning (the
  reference instead rescales 3D points to millimetres, inference.py:155).

The 12x12 eigenproblem and 3x3 Procrustes SVD are tiny dense ops that XLA
maps well; the hypothesis dimension provides the parallelism that feeds the
MXU/VPU.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from onepose_tpu.ops import lie


class PnPResult(NamedTuple):
    pose: jnp.ndarray          # [3, 4] world→camera
    inliers: jnp.ndarray       # [N] bool
    num_inliers: jnp.ndarray   # int32
    success: jnp.ndarray       # bool (enough valid points & inliers)


# ---------------------------------------------------------------------------
# TPU-friendly small linear algebra
#
# Batched jnp.linalg.eigh / svd on tiny matrices lower to QR-iteration loops
# that dominate the RANSAC runtime on TPU; these fixed-iteration kernels map
# to plain matmuls/solves instead.
# ---------------------------------------------------------------------------

def _inv_psd(A: jnp.ndarray) -> jnp.ndarray:
    """Analytic inverse of a (well-shifted) symmetric PD matrix via nested
    2x2 block Schur complements down to 3x3 adjugate inverses.

    Batched Cholesky + triangular solves lower to sequential column loops
    on TPU and dominate the RANSAC hypothesis stage; this is pure
    elementwise math + tiny matmuls, fully parallel under vmap. D must be
    divisible by 3. Unpivoted, so only safe for shifted PD systems (the
    inverse-power-iteration use below needs direction, not digits).
    """
    D = A.shape[0]
    if D % 3 != 0:
        # Without this, e.g. D=4 picks m=0 and recurses on itself forever.
        raise ValueError(f"_inv_psd requires D divisible by 3, got {D}")
    if D == 3:
        return _inv3(A)
    m = 3 * ((D // 3) // 2)  # leading block size (multiple of 3)
    P, Q = A[:m, :m], A[:m, m:]
    S = A[m:, m:]
    Pi = _inv_psd(P)
    PiQ = Pi @ Q
    Si = _inv_psd(S - Q.T @ PiQ)
    TL = Pi + PiQ @ Si @ PiQ.T
    TR = -PiQ @ Si
    return jnp.concatenate([
        jnp.concatenate([TL, TR], axis=1),
        jnp.concatenate([TR.T, Si], axis=1),
    ], axis=0)


def smallest_eigvec(A: jnp.ndarray, iters: int = 8,
                    rq_iters: int = 0, shift: float = 1e-6) -> jnp.ndarray:
    """Eigenvector of symmetric PSD A ([D, D]) with the smallest eigenvalue:
    inverse power iteration, optionally followed by Rayleigh-quotient
    iterations (cubic convergence, but each step is a pivoted LU solve —
    scalar-heavy on TPU, so off by default; degenerate minimal samples are
    handled by the dedicated planar solver instead).

    TPU shape: the shifted inverse comes from the analytic block-Schur
    :func:`_inv_psd` (no Cholesky/triangular solves, which lower to
    sequential loops), and the ``iters`` power steps collapse into
    ``ceil(log2 iters)`` repeated squarings of A^-1 — identical iteration
    math, all batched DxD matmuls under the RANSAC vmap. Frobenius
    normalization between squarings prevents fp32 overflow of
    lambda_max(A^-1)^(2^k)."""
    D = A.shape[0]
    eye = jnp.eye(D, dtype=A.dtype)
    scale = jnp.trace(A) / D + 1e-12
    Ainv = _inv_psd(A + (shift * scale) * eye)

    n_sq = max(int(np.ceil(np.log2(max(iters, 1)))), 0)
    B = Ainv / jnp.maximum(jnp.linalg.norm(Ainv), 1e-30)
    for _ in range(n_sq):
        B = B @ B
        B = B / jnp.maximum(jnp.linalg.norm(B), 1e-30)

    v0 = jnp.ones((D,), A.dtype) / jnp.sqrt(jnp.float32(D))
    v = B @ v0
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-20)

    def rq_body(_, v):
        sigma = v @ A @ v
        y = jnp.linalg.solve(A - (sigma - 1e-7 * scale) * eye, v)
        return y / jnp.maximum(jnp.linalg.norm(y), 1e-20)

    return jax.lax.fori_loop(0, rq_iters, rq_body, v)


def _inv3(M: jnp.ndarray) -> jnp.ndarray:
    """Analytic 3x3 inverse (adjugate / det)."""
    a, b, c = M[0, 0], M[0, 1], M[0, 2]
    d, e, f = M[1, 0], M[1, 1], M[1, 2]
    g, h, i = M[2, 0], M[2, 1], M[2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    Dd = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    Hh = b * g - a * h
    Ii = a * e - b * d
    det = a * A + b * Dd + c * G
    det = jnp.where(jnp.abs(det) < 1e-20,
                    jnp.where(det < 0, -1e-20, 1e-20), det)
    adj = jnp.array([[A, B, C], [Dd, E, F], [G, Hh, Ii]])
    return adj / det


def _eigh3_sym(A: jnp.ndarray):
    """Closed-form eigendecomposition of a symmetric 3x3 matrix.

    Returns ``(eigvals [3] ascending, eigvecs [3, 3])`` with columns
    matching — the ``jnp.linalg.eigh`` convention — but via the
    trigonometric characteristic-polynomial solution: pure elementwise
    math, no QR-iteration while_loops (which dominate tiny-eigh runtime
    on TPU and serialize under vmap). For repeated eigenvalues the
    individual directions are arbitrary, but the returned basis is still
    orthonormal — sufficient for every caller here (principal axes,
    plane normals, Rayleigh-Ritz rotations).
    """
    a00, a01, a02 = A[0, 0], A[0, 1], A[0, 2]
    a11, a12, a22 = A[1, 1], A[1, 2], A[2, 2]
    eye = jnp.eye(3, dtype=A.dtype)
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    Bm = (A - q * eye) / p
    r = jnp.clip(jnp.linalg.det(Bm) / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    vals = jnp.stack([e_lo, e_mid, e_hi])

    def null_dir(lam, fallback):
        # eigenvector = null direction of (A - lam I): the largest cross
        # product of two of its rows (branchless; exact for simple
        # eigenvalues, falls back under degeneracy).
        M = A - lam * eye
        cands = jnp.stack([jnp.cross(M[0], M[1]),
                           jnp.cross(M[0], M[2]),
                           jnp.cross(M[1], M[2])])
        norms = jnp.linalg.norm(cands, axis=1)
        v = cands[jnp.argmax(norms)]
        v = jnp.where(jnp.max(norms) > 1e-24, v, fallback)
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-30)

    v_hi = null_dir(e_hi, eye[0])
    v_lo = null_dir(e_lo, eye[1])
    # Orthonormal completion. Direction matters: null_dir is exact only
    # for a SIMPLE eigenvalue, and projecting the exact vector off an
    # ill-posed one transfers the degenerate pair's error into it
    # (measured: up to ~16 deg of plane-normal tilt for a symmetric
    # planar covariance with eigenvalues (0, s, s) when v_lo was
    # orthogonalized against the degenerate v_hi). Trust whichever end
    # of the spectrum is more isolated and orthogonalize the other
    # against it — branchless via where.
    lo_isolated = (e_mid - e_lo) >= (e_hi - e_mid)
    v_t = jnp.where(lo_isolated, v_lo, v_hi)   # trusted (simple) end
    v_o = jnp.where(lo_isolated, v_hi, v_lo)   # possibly degenerate end
    v_o = v_o - jnp.dot(v_o, v_t) * v_t
    n_o = jnp.linalg.norm(v_o)
    alt = jnp.cross(v_t, eye[jnp.argmin(jnp.abs(v_t))])
    alt = alt / jnp.maximum(jnp.linalg.norm(alt), 1e-30)
    v_o = jnp.where(n_o > 1e-12, v_o / jnp.maximum(n_o, 1e-30), alt)
    v_lo = jnp.where(lo_isolated, v_t, v_o)
    v_hi = jnp.where(lo_isolated, v_o, v_t)
    v_mid = jnp.cross(v_hi, v_lo)
    vecs = jnp.stack([v_lo, v_mid, v_hi], axis=1)
    return vals, vecs


# Fixed well-spread [12, 3] start block for the EPnP null-space subspace
# iteration (orthonormalized once on host; any dense full-rank block works).
_SUBSPACE_V0 = np.linalg.qr(
    np.random.default_rng(7).normal(size=(12, 3)))[0].astype(np.float32)


def smallest_eigvecs3_12(A: jnp.ndarray, iters: int = 4,
                         shift: float = 1e-6) -> jnp.ndarray:
    """The three eigenvectors of symmetric PSD ``A`` [12, 12] with the
    smallest eigenvalues, as columns of a [12, 3] matrix in ascending
    eigenvalue order.

    TPU shape: inverse subspace iteration — ``iters`` applications of the
    analytic block-Schur inverse (:func:`_inv_psd`, no triangular-solve
    loops) with a Gram-Schmidt re-orthonormalization between steps (keeps
    the block full-rank while the inverse amplifies the small end of the
    spectrum), then a Rayleigh-Ritz rotation whose 3x3 eigenproblem is
    closed-form (:func:`_eigh3_sym`). Replaces ``jnp.linalg.eigh`` whose
    QR-iteration while_loop dominated the LO-RANSAC refit stage.
    """
    D = A.shape[0]
    eye = jnp.eye(D, dtype=A.dtype)
    scale = jnp.trace(A) / D + 1e-12
    Ainv = _inv_psd(A + (shift * scale) * eye)

    def orthonormalize(V):
        q0 = V[:, 0] / jnp.maximum(jnp.linalg.norm(V[:, 0]), 1e-30)
        v1 = V[:, 1] - jnp.dot(q0, V[:, 1]) * q0
        q1 = v1 / jnp.maximum(jnp.linalg.norm(v1), 1e-30)
        v2 = V[:, 2] - jnp.dot(q0, V[:, 2]) * q0 - jnp.dot(q1, V[:, 2]) * q1
        q2 = v2 / jnp.maximum(jnp.linalg.norm(v2), 1e-30)
        return jnp.stack([q0, q1, q2], axis=1)

    V = jnp.asarray(_SUBSPACE_V0, A.dtype)
    for _ in range(iters):
        V = orthonormalize(Ainv @ V)
    T = V.T @ A @ V
    _, W = _eigh3_sym(0.5 * (T + T.T))
    return V @ W


def closest_rotation(M: jnp.ndarray, iters: int = 6):
    """Nearest proper rotation to a 3x3 matrix via Newton polar iteration
    X ← (X + X^-T)/2 (quadratic convergence), with a det-sign flip.
    Replaces the per-hypothesis 3x3 SVD. Returns (R, lam) with
    M ≈ lam * R (lam carries the det sign, matching the SVD-based
    mean-singular-value scale)."""
    det = jnp.linalg.det(M)
    sign = jnp.where(det < 0, -1.0, 1.0)
    X0 = M * sign
    nrm = jnp.sqrt(jnp.sum(X0 * X0) / 3.0) + 1e-12
    X = X0 / nrm

    def body(X):
        # scaled Newton: mu = |det X|^(-1/3) equalizes the singular values
        # around 1, giving fast global convergence even for spread spectra
        mu = jnp.abs(jnp.linalg.det(X)) ** (-1.0 / 3.0)
        mu = jnp.clip(mu, 1e-4, 1e4)
        Xs = mu * X
        return 0.5 * (Xs + _inv3(Xs).T)

    # Python-unrolled: static trip count, tiny 3x3 body — a while-loop's
    # per-iteration overhead would dominate (see _quartic_roots).
    R = X
    for _ in range(iters):
        R = body(R)
    lam_pos = jnp.trace(R.T @ X0) / 3.0
    return R, sign * lam_pos


# ---------------------------------------------------------------------------
# EPnP core (weighted, static shapes)
# ---------------------------------------------------------------------------

def _control_points(pts3d: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted centroid + principal-axis control points. pts3d: [N, 3],
    w: [N] (>= 0, sums > 0) → [4, 3]."""
    wsum = jnp.sum(w) + 1e-12
    c0 = jnp.sum(pts3d * w[:, None], axis=0) / wsum
    centered = (pts3d - c0) * jnp.sqrt(w)[:, None]
    cov = centered.T @ centered / wsum
    eigval, eigvec = _eigh3_sym(cov)  # ascending, closed form
    # scale axes by sqrt eigenvalue; floor for degenerate (planar) sets
    scales = jnp.sqrt(jnp.maximum(eigval, 1e-10))
    ctrl = c0[None, :] + eigvec.T * scales[:, None]
    return jnp.concatenate([c0[None, :], ctrl], axis=0)  # [4, 3]


def _barycentric(pts3d: jnp.ndarray, ctrl: jnp.ndarray) -> jnp.ndarray:
    """Barycentric coordinates of pts3d w.r.t. the 4 control points.
    pts3d: [N, 3] → alphas [N, 4] with rows summing to 1."""
    B = (ctrl[1:] - ctrl[0]).T  # [3, 3]
    rhs = (pts3d - ctrl[0]).T   # [3, N]
    # Regularized solve for robustness to degenerate minimal samples.
    BtB = B.T @ B + 1e-10 * jnp.eye(3, dtype=pts3d.dtype)
    a123 = (_inv3(BtB) @ (B.T @ rhs)).T  # [N, 3] (analytic 3x3 inverse)
    a0 = 1.0 - jnp.sum(a123, axis=1, keepdims=True)
    return jnp.concatenate([a0, a123], axis=1)


def _build_MtM(alphas: jnp.ndarray, uv_norm: jnp.ndarray,
               w: jnp.ndarray) -> jnp.ndarray:
    """Accumulate the weighted 12x12 normal matrix of the EPnP design matrix
    in normalized camera coordinates (fx=fy=1, cx=cy=0).

    Row pair per point i: for control point j,
      M[2i,   3j:3j+3] = alpha_ij * [1, 0, -u_i]
      M[2i+1, 3j:3j+3] = alpha_ij * [0, 1, -v_i]
    """
    n = alphas.shape[0]
    u = uv_norm[:, 0]
    v = uv_norm[:, 1]
    zeros = jnp.zeros_like(u)
    ones = jnp.ones_like(u)
    # [N, 3] per-axis coefficient patterns
    row_u = jnp.stack([ones, zeros, -u], axis=1)
    row_v = jnp.stack([zeros, ones, -v], axis=1)
    # M rows: [N, 2, 4, 3] = alpha x pattern
    M = jnp.stack([row_u, row_v], axis=1)[:, :, None, :] * \
        alphas[:, None, :, None]
    M = M.reshape(n, 2, 12)
    MtM = jnp.einsum("nri,nrj,n->ij", M, M, w,
                     preferred_element_type=jnp.float32)
    return MtM


def _solve_beta1(v: jnp.ndarray, ctrl_w: jnp.ndarray) -> jnp.ndarray:
    """Scale a single null-space vector so inter-control-point distances match
    the world distances. v: [12] → camera control points [4, 3]."""
    cc = v.reshape(4, 3)
    idx_i, idx_j = jnp.triu_indices(4, k=1)
    d_cam = jnp.linalg.norm(cc[idx_i] - cc[idx_j], axis=1)
    d_world = jnp.linalg.norm(ctrl_w[idx_i] - ctrl_w[idx_j], axis=1)
    beta = jnp.sum(d_cam * d_world) / (jnp.sum(d_cam * d_cam) + 1e-12)
    return beta * cc


def _procrustes(ctrl_w: jnp.ndarray, ctrl_c: jnp.ndarray,
                alphas: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Rigid world→camera transform from control-point correspondences,
    using all observed points (weighted Kabsch). Returns [3, 4]."""
    # Reconstruct per-point camera coordinates, fix the sign so that the
    # weighted mean depth is positive (points in front of the camera).
    pts_c = alphas @ ctrl_c          # [N, 3]
    pts_w = alphas @ ctrl_w          # [N, 3]
    wsum = jnp.sum(w) + 1e-12
    mean_z = jnp.sum(pts_c[:, 2] * w) / wsum
    sign = jnp.where(mean_z < 0, -1.0, 1.0)
    pts_c = pts_c * sign

    mu_w = jnp.sum(pts_w * w[:, None], axis=0) / wsum
    mu_c = jnp.sum(pts_c * w[:, None], axis=0) / wsum
    cov = ((pts_c - mu_c) * w[:, None]).T @ (pts_w - mu_w)
    # Kabsch rotation = proper polar factor of the covariance
    R, _ = closest_rotation(cov)
    t = mu_c - R @ mu_w
    return jnp.concatenate([R, t[:, None]], axis=1)


def epnp(pts3d: jnp.ndarray, uv_norm: jnp.ndarray,
         weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted EPnP in normalized camera coordinates.

    pts3d: [N, 3] world points; uv_norm: [N, 2] normalized image coords
    (K^-1 applied); weights: [N] >= 0. Returns pose [3, 4] (world→camera).

    Evaluates the three smallest null-space vectors as beta-case-1 candidates
    and keeps the lowest-reprojection solution — robust across the
    minimal-sample and all-inlier regimes without the full beta-case system.
    """
    ctrl_w = _control_points(pts3d, weights)
    alphas = _barycentric(pts3d, ctrl_w)
    MtM = _build_MtM(alphas, uv_norm, weights)
    null3 = smallest_eigvecs3_12(MtM)  # [12, 3], ascending eigenvalues

    def candidate(v):
        ctrl_c = _solve_beta1(v, ctrl_w)
        pose = _procrustes(ctrl_w, ctrl_c, alphas, weights)
        K_eye = jnp.eye(3, dtype=pts3d.dtype)
        proj = lie.project(pose, K_eye, pts3d)
        err = jnp.sum((proj - uv_norm) ** 2, axis=-1)
        cost = jnp.sum(err * weights) / (jnp.sum(weights) + 1e-12)
        return pose, cost

    poses, costs = jax.vmap(candidate)(null3.T)
    best = jnp.argmin(costs)
    return poses[best]


def planar_pnp(pts3d: jnp.ndarray, uv_norm: jnp.ndarray,
               weights: jnp.ndarray) -> jnp.ndarray:
    """Homography-based pose for (near-)planar point sets.

    Coplanar points make the full P6P DLT rank-deficient (the projection
    column along the plane normal is unconstrained — nullspace dim 4), so a
    generic null-vector solve returns garbage. Planar objects are a core
    OnePose case (boxes), so minimal hypotheses evaluate this solver too:
    fit the plane, estimate the plane→image homography (8 DoF, well-posed),
    and decompose H = [r1 r2 t] with a polar orthonormalization.

    Returns pose [3, 4]; for clearly non-planar samples the result simply
    scores badly against the caller's reprojection cost.
    """
    wsum = jnp.sum(weights) + 1e-12
    c = jnp.sum(pts3d * weights[:, None], axis=0) / wsum
    centered = (pts3d - c) * jnp.sqrt(weights)[:, None]
    cov = centered.T @ centered / wsum
    # plane normal = smallest principal axis (tiny 3x3 → power iteration)
    normal = _eigh3_sym(cov)[1][:, 0]  # closed form, no power iteration
    # in-plane basis via Gram-Schmidt against the least-aligned unit axis
    pick = jnp.argmin(jnp.abs(normal))
    e_seed = jnp.eye(3, dtype=pts3d.dtype)[pick]
    e1 = e_seed - jnp.dot(e_seed, normal) * normal
    e1 = e1 / jnp.maximum(jnp.linalg.norm(e1), 1e-12)
    e2 = jnp.cross(normal, e1)
    basis = jnp.stack([e1, e2, normal], axis=1)  # columns

    p2 = (pts3d - c) @ basis[:, :2]  # [N, 2] plane coords

    # homography DLT: [p2, 1] → uv_norm; A [2N, 9]
    n = pts3d.shape[0]
    P = jnp.concatenate([p2, jnp.ones((n, 1), pts3d.dtype)], axis=1)
    zeros = jnp.zeros_like(P)
    u = uv_norm[:, 0:1]
    v = uv_norm[:, 1:2]
    A = jnp.concatenate([
        jnp.concatenate([P, zeros, -u * P], axis=1),
        jnp.concatenate([zeros, P, -v * P], axis=1),
    ], axis=0)
    w2 = jnp.concatenate([weights, weights])
    AtA = jnp.einsum("ni,nj,n->ij", A, A, w2,
                     preferred_element_type=jnp.float32)
    h = smallest_eigvec(AtA)
    H = h.reshape(3, 3)

    def extract(sign):
        Hs = sign * H
        h1, h2, h3 = Hs[:, 0], Hs[:, 1], Hs[:, 2]
        lam = 0.5 * (jnp.linalg.norm(h1) + jnp.linalg.norm(h2)) + 1e-12
        Rp_raw = jnp.stack(
            [h1 / lam, h2 / lam, jnp.cross(h1, h2) / (lam * lam)], axis=1)
        Rp, _ = closest_rotation(Rp_raw)
        t_p = h3 / lam
        R_final = Rp @ basis.T
        t_final = t_p - R_final @ c
        pose = jnp.concatenate([R_final, t_final[:, None]], axis=1)
        cam = lie.transform(pose, pts3d)
        z = cam[:, 2]
        proj = cam[:, :2] / jnp.maximum(jnp.abs(z), 1e-6)[:, None]
        err = jnp.sum((proj - uv_norm) ** 2, axis=-1)
        cost = jnp.sum(err * weights) + 1e6 * jnp.sum((z <= 0) * weights)
        return pose, cost

    pose_a, cost_a = extract(1.0)
    pose_b, cost_b = extract(-1.0)
    return jnp.where(cost_a <= cost_b, pose_a, pose_b)


def p6p_dlt(pts3d: jnp.ndarray, uv_norm: jnp.ndarray,
            weights: jnp.ndarray) -> jnp.ndarray:
    """Direct linear transform for the full projection matrix from >= 6
    correspondences in normalized camera coordinates, followed by rotation
    extraction. Used for RANSAC minimal hypotheses, where EPnP's
    single-null-vector assumption breaks (kernel dim > 1 for minimal sets).

    Returns pose [3, 4] (world→camera).
    """
    n = pts3d.shape[0]
    X = jnp.concatenate([pts3d, jnp.ones((n, 1), pts3d.dtype)], axis=1)
    zeros = jnp.zeros_like(X)
    u = uv_norm[:, 0:1]
    v = uv_norm[:, 1:2]
    rows_u = jnp.concatenate([X, zeros, -u * X], axis=1)   # [N, 12]
    rows_v = jnp.concatenate([zeros, X, -v * X], axis=1)   # [N, 12]
    A = jnp.concatenate([rows_u, rows_v], axis=0)          # [2N, 12]
    w2 = jnp.concatenate([weights, weights], axis=0)
    AtA = jnp.einsum("ni,nj,n->ij", A, A, w2,
                     preferred_element_type=jnp.float32)
    P = smallest_eigvec(AtA).reshape(3, 4)

    def extract(sign):
        Ps = sign * P
        R, lam = closest_rotation(Ps[:, :3])
        t = Ps[:, 3] / jnp.where(jnp.abs(lam) < 1e-12, 1e-12, lam)
        pose = jnp.concatenate([R, t[:, None]], axis=1)
        cam = lie.transform(pose, pts3d)
        z = cam[:, 2]
        proj = cam[:, :2] / jnp.maximum(jnp.abs(z), 1e-6)[:, None]
        err = jnp.sum((proj - uv_norm) ** 2, axis=-1)
        neg_depth = jnp.sum((z <= 0) * weights)
        cost = jnp.sum(err * weights) + 1e6 * neg_depth
        return pose, cost

    pose_a, cost_a = extract(1.0)
    pose_b, cost_b = extract(-1.0)
    return jnp.where(cost_a <= cost_b, pose_a, pose_b)


def _quartic_roots(coeffs: jnp.ndarray, iters: int = 30) -> jnp.ndarray:
    """All four complex roots of a quartic (coeffs [5], descending powers)
    via fixed-iteration Durand–Kerner — fully elementwise complex math,
    vmap-friendly (no data-dependent branching, unlike Ferrari's closed
    form which is fp32-treacherous)."""
    lead = coeffs[0]
    lead = jnp.where(jnp.abs(lead) < 1e-20, 1e-20, lead)
    c = (coeffs / lead).astype(jnp.complex64)  # monic

    def poly(z):
        return (((z + c[1]) * z + c[2]) * z + c[3]) * z + c[4]

    z0 = (0.4 + 0.9j) ** jnp.arange(1, 5).astype(jnp.complex64)

    def body(z):
        pz = poly(z)
        diff = z[:, None] - z[None, :] + jnp.eye(4, dtype=z.dtype)
        denom = jnp.prod(diff, axis=1)
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        step = pz / denom
        # clip wild steps (fp32 overflow guard); converged roots stay put
        mag = jnp.abs(step)
        step = jnp.where(mag > 10.0, step * (10.0 / mag), step)
        return z - step

    # Python-unrolled (static trip count): a lax.fori_loop here lowers to
    # a device while-loop whose per-iteration overhead dwarfs the ~15
    # elementwise ops of the body; unrolled, XLA fuses the whole chain.
    z = z0
    for _ in range(iters):
        z = body(z)
    return z


# Vandermonde inverse for degree-4 coefficient extraction from values at
# v ∈ {-2,-1,0,1,2} (rows: coefficient of v^4..v^0).
_V5 = np.vander(np.array([-2.0, -1.0, 0.0, 1.0, 2.0]), 5)
_V5_INV = np.linalg.inv(_V5).astype(np.float32)


def p3p(pts3d: jnp.ndarray, uv_norm: jnp.ndarray) -> jnp.ndarray:
    """Grunert P3P: up to 4 poses from exactly 3 correspondences.

    The reference's RANSAC reaches 10k sequential EPnP(5-point) trials
    (/root/reference/src/utils/eval_utils.py:28-29); a 3-point minimal
    solver is what makes a PARALLEL hypothesis budget competitive at high
    outlier fractions (p_inlier^3 vs p^6 clean-sample probability — at 70%
    outliers a 6-point clean sample is ~7e-4, a 3-point one is 2.7e-2).

    pts3d: [3, 3] world points; uv_norm: [3, 2] normalized camera coords.
    Returns poses [4, 3, 4]; infeasible branches return garbage that
    simply scores zero inliers in the caller.

    Method: law-of-cosines distance system reduced to a quartic in
    v = s3/s1 (Grunert 1841, per Haralick's review). The quartic's
    coefficients are recovered numerically by evaluating its residual
    polynomial at 5 abscissae and solving a fixed Vandermonde system —
    avoids hand-derived coefficient algebra; roots via Durand–Kerner.
    """
    f = jnp.concatenate(
        [uv_norm, jnp.ones((3, 1), uv_norm.dtype)], axis=1)
    f = f / jnp.linalg.norm(f, axis=1, keepdims=True)   # bearings [3, 3]
    P1, P2, P3 = pts3d[0], pts3d[1], pts3d[2]
    a2 = jnp.sum((P2 - P3) ** 2)
    b2 = jnp.sum((P1 - P3) ** 2)
    c2 = jnp.sum((P1 - P2) ** 2)
    b2 = jnp.where(b2 < 1e-12, 1e-12, b2)
    cos_a = jnp.dot(f[1], f[2])
    cos_b = jnp.dot(f[0], f[2])
    cos_g = jnp.dot(f[0], f[1])

    # residual polynomial R(v) (degree 4): with
    #   N(v) = ((a²-c²)/b²)(1+v²-2v cosβ) + 1 - v²     (u = N/D)
    #   D(v) = 2(cosγ - v cosα)
    # R = N² - 2 N D cosγ + D²(1 - (c²/b²)(1+v²-2v cosβ))
    ac_b = (a2 - c2) / b2
    c_b = c2 / b2
    vs = jnp.asarray([-2.0, -1.0, 0.0, 1.0, 2.0], pts3d.dtype)
    q = 1.0 + vs * vs - 2.0 * vs * cos_b
    N = ac_b * q + 1.0 - vs * vs
    D = 2.0 * (cos_g - vs * cos_a)
    R = N * N - 2.0 * N * D * cos_g + D * D * (1.0 - c_b * q)
    coeffs = jnp.asarray(_V5_INV) @ R               # v^4 .. v^0
    scale = jnp.max(jnp.abs(coeffs)) + 1e-20
    roots = _quartic_roots(coeffs / scale)

    def pose_from_root(z):
        v = jnp.real(z)
        ok = (jnp.abs(jnp.imag(z)) < 1e-3 * (1.0 + jnp.abs(v))) & (v > 0)
        qv = 1.0 + v * v - 2.0 * v * cos_b
        qv = jnp.where(qv < 1e-12, 1e-12, qv)
        Dv = 2.0 * (cos_g - v * cos_a)
        Dv = jnp.where(jnp.abs(Dv) < 1e-9,
                       jnp.where(Dv < 0, -1e-9, 1e-9), Dv)
        u = (ac_b * qv + 1.0 - v * v) / Dv
        s1 = jnp.sqrt(b2 / qv)
        s = jnp.stack([s1, u * s1, v * s1])
        ok = ok & jnp.all(s > 0)
        Xc = s[:, None] * f                          # camera-frame points

        # exact frame-to-frame rotation from the two congruent triangles
        def frame(X):
            e1 = X[1] - X[0]
            e1 = e1 / (jnp.linalg.norm(e1) + 1e-12)
            n = jnp.cross(e1, X[2] - X[0])
            n = n / (jnp.linalg.norm(n) + 1e-12)
            return jnp.stack([e1, n, jnp.cross(e1, n)], axis=1)

        Fc = frame(Xc)
        Fw = frame(pts3d)
        Rm = Fc @ Fw.T
        t = Xc[0] - Rm @ P1
        pose = jnp.concatenate([Rm, t[:, None]], axis=1)
        # infeasible root → far-away pose (scores zero inliers)
        bad = jnp.concatenate(
            [jnp.eye(3, dtype=pose.dtype),
             jnp.asarray([[0.0], [0.0], [1e9]], pose.dtype)], axis=1)
        return jnp.where(ok, pose, bad)

    return jax.vmap(pose_from_root)(roots)           # [4, 3, 4]


# ---------------------------------------------------------------------------
# Gauss–Newton SE(3) polish
# ---------------------------------------------------------------------------

def gauss_newton_refine(pose: jnp.ndarray, pts3d: jnp.ndarray,
                        uv_norm: jnp.ndarray, weights: jnp.ndarray,
                        iters: int = 5, damping: float = 1e-6) -> jnp.ndarray:
    """Fixed-iteration damped Gauss–Newton on the reprojection objective in
    normalized coordinates. Static shapes; [3, 4] → [3, 4]."""

    def residuals(pose):
        cam = lie.transform(pose, pts3d)               # [N, 3]
        z = jnp.maximum(cam[:, 2:3], 1e-6)
        proj = cam[:, :2] / z
        return (proj - uv_norm) * jnp.sqrt(weights)[:, None]

    def jacobian(pose):
        cam = lie.transform(pose, pts3d)
        x, y = cam[:, 0], cam[:, 1]
        z = jnp.maximum(cam[:, 2], 1e-6)
        iz = 1.0 / z
        iz2 = iz * iz
        # d(proj)/d(cam): [N, 2, 3]
        J_proj = jnp.stack([
            jnp.stack([iz, jnp.zeros_like(iz), -x * iz2], axis=-1),
            jnp.stack([jnp.zeros_like(iz), iz, -y * iz2], axis=-1),
        ], axis=1)
        # d(cam)/d(delta) with left-multiplied increment exp([w, t]):
        # dcam = -[cam]_x w + t → [N, 3, 6]
        J_cam = jnp.concatenate([-lie.hat(cam),
                                 jnp.broadcast_to(jnp.eye(3, dtype=cam.dtype),
                                                  (cam.shape[0], 3, 3))],
                                axis=-1)
        J = jnp.einsum("nij,njk->nik", J_proj, J_cam)  # [N, 2, 6]
        return J * jnp.sqrt(weights)[:, None, None]

    def step(pose):
        r = residuals(pose).reshape(-1)
        J = jacobian(pose).reshape(-1, 6)
        H = J.T @ J + damping * jnp.eye(6, dtype=pose.dtype)
        g = J.T @ r
        # analytic block-Schur inverse: H is damped PD and 6x6, and the
        # LU while_loop of jnp.linalg.solve serialized the whole GN scan
        delta = -(_inv_psd(H) @ g)
        R_new = lie.so3_exp(delta[:3]) @ pose[:, :3]
        t_new = lie.so3_exp(delta[:3]) @ pose[:, 3] + delta[3:]
        return jnp.concatenate([R_new, t_new[:, None]], axis=1)

    # Python-unrolled (static trip count) so XLA schedules the iterations
    # as one fused region instead of a device while-loop.
    for _ in range(iters):
        pose = step(pose)
    return pose


# ---------------------------------------------------------------------------
# RANSAC driver
# ---------------------------------------------------------------------------

def _sample_hypothesis_indices(key: jax.Array, mask: jnp.ndarray,
                               num_hypotheses: int,
                               sample_size: int) -> jnp.ndarray:
    """[H, S] random index subsets drawn from valid slots (Gumbel top-k:
    uniform noise + log-mask → distinct top-S valid indices)."""
    n = mask.shape[0]
    noise = jax.random.uniform(key, (num_hypotheses, n))
    scored = jnp.where(mask[None, :], noise, -1.0)
    _, idx = jax.lax.top_k(scored, sample_size)
    return idx


@functools.partial(
    jax.jit,
    static_argnames=("num_hypotheses", "refine_iters", "sample_size",
                     "lo_hypotheses", "lo_iters", "profile_prefix"),
)
def ransac_pnp(key: jax.Array, pts2d: jnp.ndarray, pts3d: jnp.ndarray,
               mask: jnp.ndarray, K: jnp.ndarray,
               reproj_threshold: float = 5.0,
               num_hypotheses: int = 512,
               sample_size: int = 6,
               refine_iters: int = 5,
               lo_hypotheses: int = 64,
               lo_iters: int = 2,
               profile_prefix: Optional[str] = None) -> PnPResult:
    """On-device LO-RANSAC PnP.

    pts2d: [N, 2] pixel coords; pts3d: [N, 3]; mask: [N] bool valid
    correspondences; K: [3, 3]. Inlier definition matches the reference:
    reprojection error < ``reproj_threshold`` pixels
    (/root/reference/src/utils/eval_utils.py:28).

    Round 1 splits the hypothesis budget across three minimal-solver
    families — P3P (3-point Grunert: the sample-efficiency workhorse at
    high outlier fractions), planar homography (4-point: the only
    well-posed family for coplanar objects — boxes), and P6P DLT
    (6-point: robust for well-conditioned general scenes). Round 2
    (LO-RANSAC) draws ``lo_hypotheses`` NON-minimal samples from the best
    consensus set and iterates refit→rescore ``lo_iters`` times — this is
    what closes the gap to the reference's 10k sequential cv2 iterations
    when only a handful of round-1 samples are clean. All shapes static;
    every stage is vmapped, the winner is an argmax.

    ``profile_prefix`` (measurement-only, default None = full solve)
    truncates the program after a named stage — "solve" (minimal-solver
    hypotheses), "score" (+ MSAC scoring & top-K), "lo" (+ the LO
    non-minimal round), "refit" (+ per-candidate refit chains) — and
    returns the best-so-far pose in a normal PnPResult so
    scripts/profile_pnp.py can time cumulative in-context prefixes
    (docs/DESIGN.md §8 protocol). Never set it on a product path.

    NUMERICS: every matmul in here runs at true fp32 precision. TPU's
    default matmul precision rounds fp32 inputs to bf16 (~0.4% relative),
    which measurably corrupts the tiny geometric solves (quartic
    coefficients, Procrustes frames, DLT normal matrices) — measured as a
    2x success-rate loss vs CPU at 70% outliers. These matmuls are
    microscopic next to the conv/GNN stages, so fp32 here is free.
    """
    with jax.default_matmul_precision("float32"):
        return _ransac_pnp_body(
            key, pts2d, pts3d, mask, K, reproj_threshold, num_hypotheses,
            sample_size, refine_iters, lo_hypotheses, lo_iters,
            profile_prefix)


def _ransac_pnp_body(key, pts2d, pts3d, mask, K, reproj_threshold,
                     num_hypotheses, sample_size, refine_iters,
                     lo_hypotheses, lo_iters,
                     profile_prefix=None) -> PnPResult:
    pts2d = pts2d.astype(jnp.float32)
    pts3d = pts3d.astype(jnp.float32)
    K = K.astype(jnp.float32)
    maskf = mask.astype(jnp.float32)
    n_valid = jnp.sum(mask)

    # Normalized camera coordinates for conditioning.
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    uv_norm = jnp.stack(
        [(pts2d[:, 0] - cx) / fx, (pts2d[:, 1] - cy) / fy], axis=1)

    # Score hypotheses: pixel reprojection error against all points.
    # MSAC truncated-quadratic score breaks consensus-count ties toward
    # the accurate pose — at 70% outliers a handful of true inliers must
    # beat accidental outlier consensus, and pure counts lose those ties.
    # Sqrt-free: err_px < thr ⟺ err_px² < thr², and the MSAC term
    # 1 - (err/thr)² only needs the square.
    thr2 = reproj_threshold * reproj_threshold

    def score(pose):
        cam = lie.transform(pose, pts3d)
        z = cam[:, 2]
        proj = cam[:, :2] / jnp.maximum(jnp.abs(z), 1e-6)[:, None]
        err2 = (((proj[:, 0] - uv_norm[:, 0]) * fx) ** 2
                + ((proj[:, 1] - uv_norm[:, 1]) * fy) ** 2)
        good = (err2 < thr2) & (z > 0) & mask
        msac = jnp.sum(jnp.where(good, 1.0 - err2 / thr2, 0.0))
        return good, jnp.sum(good), msac

    def msac_for(pose):
        return score(pose)[2]

    # Scoring MANY poses via vmap(score) lowers to one [N,3]x[3,3] matmul
    # per pose — ~2% MXU lane utilization — and was the largest PnP
    # sub-stage (2.79 of 7.47 ms/batch-8, scripts/profile_pnp.py).
    # Restructured: one homogeneous [N,4] x [4,H] matmul per camera-space
    # coordinate puts all H hypotheses in the lane axis; everything after
    # is elementwise on [N, H] with a sum reduction. Same scores.
    pts_h = jnp.concatenate(
        [pts3d, jnp.ones_like(pts3d[:, :1])], axis=1)          # [N, 4]

    def score_many(poses):
        rows = jnp.transpose(poses, (1, 2, 0))                  # [3, 4, H]
        X = pts_h @ rows[0]                                     # [N, H]
        Y = pts_h @ rows[1]
        Z = pts_h @ rows[2]
        az = jnp.maximum(jnp.abs(Z), 1e-6)
        ex = (X / az - uv_norm[:, 0:1]) * fx
        ey = (Y / az - uv_norm[:, 1:2]) * fy
        err2 = ex * ex + ey * ey
        good = (err2 < thr2) & (Z > 0) & mask[:, None]
        return jnp.sum(jnp.where(good, 1.0 - err2 / thr2, 0.0),
                       axis=0)                                  # [H]

    # --- round 1: minimal hypotheses from three solver families ---
    n_p3p = num_hypotheses // 2
    n_pl = num_hypotheses // 4
    n_p6p = num_hypotheses - n_p3p - n_pl
    key_s, key_lo = jax.random.split(key)
    k3, k4, k6 = jax.random.split(key_s, 3)

    idx3 = _sample_hypothesis_indices(k3, mask, n_p3p, 3)
    idx4 = _sample_hypothesis_indices(k4, mask, n_pl, 4)
    idx6 = _sample_hypothesis_indices(k6, mask, n_p6p, sample_size)

    poses_p3p = jax.vmap(
        lambda si: p3p(pts3d[si], uv_norm[si]))(idx3)        # [H3, 4, 3, 4]
    poses_p3p = poses_p3p.reshape(-1, 3, 4)
    poses_pl = jax.vmap(
        lambda si: planar_pnp(pts3d[si], uv_norm[si],
                              maskf[si]))(idx4)
    poses_p6 = jax.vmap(
        lambda si: p6p_dlt(pts3d[si], uv_norm[si], maskf[si]))(idx6)
    poses = jnp.concatenate([poses_p3p, poses_pl, poses_p6])  # [H', 3, 4]

    def _prefix_result(pose):
        inl, cnt, _ = score(pose)
        return PnPResult(pose, inl, cnt.astype(jnp.int32),
                         jnp.asarray(True))

    if profile_prefix == "solve":
        return _prefix_result(poses[0])

    msacs = score_many(poses)
    top_k = 4
    _, top_idx = jax.lax.top_k(msacs, top_k)
    cands = poses[top_idx]                                   # [K, 3, 4]

    if profile_prefix == "score":
        return _prefix_result(cands[0])

    # --- round 2 (LO): non-minimal resampling from the consensus set ---
    if lo_hypotheses > 0:
        lo_inl, _, _ = score(cands[0])
        lo_size = 8
        idx_lo = _sample_hypothesis_indices(
            key_lo, lo_inl, lo_hypotheses, lo_size)
        poses_lo = jax.vmap(
            lambda si: p6p_dlt(pts3d[si], uv_norm[si], maskf[si]))(idx_lo)
        msac_lo = score_many(poses_lo)
        best_lo = poses_lo[jnp.argmax(msac_lo)]
        cands = jnp.concatenate([cands, best_lo[None]])

    if profile_prefix == "lo":
        return _prefix_result(cands[-1])

    # --- iterated refit chains on every candidate + GN polish ---
    # The best raw consensus is not always the true pose's; polishing the
    # whole top-K lets a rank-2 true hypothesis overtake after refit.
    # Cost shape: the chain runs ONE damped GN step per refit iteration
    # (enough to re-rank candidates between refits); the full
    # ``refine_iters`` polish runs once, on the winner only. The original
    # formulation polished every candidate inside every scan iteration
    # (cands x lo_iters x refine_iters GN steps) and was the single
    # largest stage of the fused frame→pose program.
    chain_gn = min(1, refine_iters)

    def refit_once(pose):
        inl, _, _ = score(pose)
        w = inl.astype(jnp.float32)
        pose_g = epnp(pts3d, uv_norm, w + 1e-9)
        pose_p = planar_pnp(pts3d, uv_norm, w + 1e-9)
        pose_r = jnp.where(msac_for(pose_g) >= msac_for(pose_p),
                           pose_g, pose_p)
        pose_r = gauss_newton_refine(
            pose_r, pts3d, uv_norm, w, iters=chain_gn)
        better = msac_for(pose_r) >= msac_for(pose)
        return jnp.where(better, pose_r, pose)

    def refit_chain(pose):
        # Python-unrolled (static, small trip count): frees XLA to fuse
        # and overlap across the two refit iterations.
        for _ in range(max(lo_iters, 1)):
            pose = refit_once(pose)
        return pose

    refined = jax.vmap(refit_chain)(cands)
    msac_ref = score_many(refined)
    pose_best = refined[jnp.argmax(msac_ref)]

    if profile_prefix == "refit":
        return _prefix_result(pose_best)

    # full-strength GN polish on the winner's inlier set (kept only if it
    # does not lose consensus — mirrors the per-candidate accept rule)
    if refine_iters > 0:
        inl_b, _, _ = score(pose_best)
        pose_pol = gauss_newton_refine(
            pose_best, pts3d, uv_norm, inl_b.astype(jnp.float32),
            iters=refine_iters)
        pose_best = jnp.where(msac_for(pose_pol) >= msac_for(pose_best),
                              pose_pol, pose_best)

    pose_final = pose_best
    inliers_final, count_final, _ = score(pose_final)

    min_inl = min(sample_size, 4)
    success = (n_valid >= min_inl) & (count_final >= min_inl)
    pose_final = jnp.where(success, pose_final,
                           jnp.eye(3, 4, dtype=jnp.float32))
    return PnPResult(pose_final, inliers_final & success,
                     jnp.where(success, count_final, 0).astype(jnp.int32),
                     success)
