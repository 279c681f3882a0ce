"""Pyramidal Lucas–Kanade sparse optical flow, TPU-native.

Replaces the reference's host-side ``cv2.calcOpticalFlowPyrLK``
(/root/reference/src/tracker/ba_tracker.py:113-126; winSize 15, maxLevel 2,
10 iterations, eps 0.03) with a JAX implementation: image pyramids via
average pooling, per-keypoint window gathers (bilinear), iterative 2x2
normal-equation updates under ``lax.fori_loop``, all vmapped over keypoints.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class FlowResult(NamedTuple):
    points: jnp.ndarray   # [N, 2] tracked positions in im1
    status: jnp.ndarray   # [N] bool (trackable + stayed in bounds)
    error: jnp.ndarray    # [N] mean abs residual of the final window


def _downsample(im: jnp.ndarray) -> jnp.ndarray:
    """2x blur + decimate (average pooling)."""
    h, w = im.shape
    im = im[: h - h % 2, : w - w % 2]
    return (im[0::2, 0::2] + im[1::2, 0::2] + im[0::2, 1::2]
            + im[1::2, 1::2]) * 0.25


def _bilinear_patch(im: jnp.ndarray, center: jnp.ndarray,
                    offsets: jnp.ndarray) -> jnp.ndarray:
    """Sample a window of ``offsets`` around ``center`` (x, y) with bilinear
    interpolation and border clamping. → [K] values."""
    h, w = im.shape
    xy = center[None, :] + offsets  # [K, 2]
    x = jnp.clip(xy[:, 0], 0.0, w - 1.001)
    y = jnp.clip(xy[:, 1], 0.0, h - 1.001)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    v00 = im[y0, x0]
    v01 = im[y0, x0 + 1]
    v10 = im[y0 + 1, x0]
    v11 = im[y0 + 1, x0 + 1]
    return (v00 * (1 - tx) * (1 - ty) + v01 * tx * (1 - ty)
            + v10 * (1 - tx) * ty + v11 * tx * ty)


def _lk_level(im0, im1, pts0, guess, win: int, iters: int, eps: float,
              min_eig: float):
    """One pyramid level of LK for all points. pts0: positions in im0;
    guess: current flow estimates (positions in im1)."""
    r = win // 2
    ax = jnp.arange(win, dtype=jnp.float32) - r
    offsets = jnp.stack(
        jnp.meshgrid(ax, ax, indexing="xy"), axis=-1).reshape(-1, 2)
    dx = jnp.array([0.5, 0.0])
    dy = jnp.array([0.0, 0.5])

    def track_one(p0, g):
        patch0 = _bilinear_patch(im0, p0, offsets)
        ix = (_bilinear_patch(im0, p0 + dx, offsets)
              - _bilinear_patch(im0, p0 - dx, offsets))
        iy = (_bilinear_patch(im0, p0 + dy, offsets)
              - _bilinear_patch(im0, p0 - dy, offsets))
        gxx = jnp.sum(ix * ix)
        gxy = jnp.sum(ix * iy)
        gyy = jnp.sum(iy * iy)
        det = gxx * gyy - gxy * gxy
        trace = gxx + gyy
        eig_min = 0.5 * (trace - jnp.sqrt(
            jnp.maximum(trace * trace - 4 * det, 0.0)))
        ok = eig_min > min_eig * (win * win)
        det_s = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        Ginv = jnp.array([[gyy, -gxy], [-gxy, gxx]]) / det_s

        def body(_, carry):
            pos, done = carry
            patch1 = _bilinear_patch(im1, pos, offsets)
            di = patch0 - patch1
            b = jnp.array([jnp.sum(di * ix), jnp.sum(di * iy)])
            d = Ginv @ b
            pos_new = jnp.where(done, pos, pos + d)
            done = done | (jnp.linalg.norm(d) < eps)
            return pos_new, done

        pos, _ = jax.lax.fori_loop(
            0, iters, body, (g, jnp.logical_not(ok)))
        patch1 = _bilinear_patch(im1, pos, offsets)
        err = jnp.mean(jnp.abs(patch0 - patch1))
        return pos, ok, err

    return jax.vmap(track_one)(pts0, guess)


@functools.partial(
    jax.jit, static_argnames=("win", "levels", "iters"))
def pyramid_lk(im0: jnp.ndarray, im1: jnp.ndarray, pts: jnp.ndarray,
               win: int = 15, levels: int = 3, iters: int = 10,
               eps: float = 0.03, min_eig: float = 1e-4) -> FlowResult:
    """Track [N, 2] (x, y) points from im0 to im1 ([H, W] grayscale,
    float in [0, 1])."""
    im0 = im0.astype(jnp.float32)
    im1 = im1.astype(jnp.float32)
    pyr0 = [im0]
    pyr1 = [im1]
    for _ in range(levels - 1):
        pyr0.append(_downsample(pyr0[-1]))
        pyr1.append(_downsample(pyr1[-1]))

    scale = 2.0 ** (levels - 1)
    guess = pts / scale
    status = jnp.ones(pts.shape[0], bool)
    err = jnp.zeros(pts.shape[0])
    for lv in range(levels - 1, -1, -1):
        p_lv = pts / (2.0 ** lv)
        guess, ok, err = _lk_level(
            pyr0[lv], pyr1[lv], p_lv, guess, win, iters, eps, min_eig)
        status &= ok
        if lv > 0:
            guess = guess * 2.0

    h, w = im0.shape
    inb = ((guess[:, 0] >= 0) & (guess[:, 0] < w)
           & (guess[:, 1] >= 0) & (guess[:, 1] < h))
    return FlowResult(guess, status & inb, err)
