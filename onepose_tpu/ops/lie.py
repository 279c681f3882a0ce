"""SO(3)/SE(3) utilities in JAX — closed-form, jit/vmap-friendly.

Replaces the host-side cv2.Rodrigues calls of the reference
(/root/reference/src/utils/eval_utils.py:31) with on-device math.
"""
from __future__ import annotations

import jax.numpy as jnp


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] → [..., 3, 3] skew-symmetric matrices."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([zeros, -wz, wy], axis=-1),
        jnp.stack([wz, zeros, -wx], axis=-1),
        jnp.stack([-wy, wx, zeros], axis=-1),
    ], axis=-2)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula with a Taylor fallback near zero. [..., 3] → [..., 3, 3]."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-32)
    K = hat(w)
    KK = K @ K
    small = theta < 1e-5
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * KK


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] → [..., 3] axis-angle. Stable away from theta = pi."""
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w_hat = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], axis=-1)
    small = theta < 1e-5
    scale = jnp.where(
        small, 0.5 + theta * theta / 12.0,
        theta / (2.0 * jnp.sin(jnp.where(small, 1.0, theta)))
    )
    return scale[..., None] * w_hat


def transform(pose: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply [..., 3, 4] pose to [..., N, 3] points → camera-frame points."""
    R = pose[..., :3, :3]
    t = pose[..., :3, 3]
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def project(pose: jnp.ndarray, K: jnp.ndarray, pts: jnp.ndarray,
            eps: float = 1e-9) -> jnp.ndarray:
    """Project [..., N, 3] object points to pixels with [..., 3, 4] pose and
    [..., 3, 3] intrinsics → [..., N, 2]."""
    cam = transform(pose, pts)
    uv = cam @ jnp.swapaxes(K, -1, -2)
    z = uv[..., 2:3]
    z = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    return uv[..., :2] / z
