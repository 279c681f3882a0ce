"""Pyramidal Lucas–Kanade sparse optical flow, TPU-native.

Replaces the reference's host-side ``cv2.calcOpticalFlowPyrLK``
(/root/reference/src/tracker/ba_tracker.py:113-126; winSize 15, maxLevel 2,
10 iterations, eps 0.03) with a JAX implementation.

TPU design: image-wide random gathers are the enemy — the obvious
per-keypoint ``im[y, x]`` window sampling costs ~30 gathers of
[N, win²] scattered addresses per call and measured >500 ms/frame on a
v5e through XLA's gather lowering. Instead each point crops one margin
patch per pyramid level (vmapped ``dynamic_slice``: contiguous rows, one
shot), and every LK iteration samples its window by a *subpixel shift
inside the patch* — a tiny dynamic_slice plus a 4-tap bilinear blend,
all elementwise. The iterative solve never touches the full image.

Semantics note vs the gather formulation: per-level displacement is
bounded by the patch margin (default 8 px/level — generous next to the
window radius; cv2 marks such tracks failed via its error threshold),
and border clamping happens at the patch edge, which coincides with the
image edge for points near the border.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from onepose_tpu.ops.precision import pin_fp32


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


def _crop_patches(im: jnp.ndarray, centers: jnp.ndarray, size: int):
    """[N] patches of [size, size] around ``centers`` (x, y), origins
    clamped to the image. Returns (patches [N, size, size], origin [N, 2]
    as (ox, oy))."""
    h, w = im.shape
    half = size // 2
    ox = jnp.clip(jnp.floor(centers[:, 0]).astype(jnp.int32) - half,
                  0, max(w - size, 0))
    oy = jnp.clip(jnp.floor(centers[:, 1]).astype(jnp.int32) - half,
                  0, max(h - size, 0))
    crop = jax.vmap(
        lambda oy1, ox1: jax.lax.dynamic_slice(im, (oy1, ox1),
                                               (size, size)))
    return crop(oy, ox), jnp.stack([ox, oy], axis=1).astype(jnp.float32)


def _sample_window(patch: jnp.ndarray, local_xy: jnp.ndarray, win: int):
    """[win, win] bilinear window around ``local_xy`` (x, y in patch
    coords): integer part via a small dynamic_slice, fraction via a 4-tap
    blend. The slice start is clamped inside the patch (patch-border
    clamp, mirroring the image-border clamp of a gather sampler)."""
    r = win // 2
    P = patch.shape[0]
    bx = jnp.floor(local_xy[0]).astype(jnp.int32)
    by = jnp.floor(local_xy[1]).astype(jnp.int32)
    fx = local_xy[0] - bx.astype(jnp.float32)
    fy = local_xy[1] - by.astype(jnp.float32)
    bx = jnp.clip(bx, r, P - r - 2)
    by = jnp.clip(by, r, P - r - 2)
    sub = jax.lax.dynamic_slice(patch, (by - r, bx - r),
                                (win + 1, win + 1))
    w00 = (1 - fx) * (1 - fy)
    w01 = fx * (1 - fy)
    w10 = (1 - fx) * fy
    w11 = fx * fy
    return (sub[:win, :win] * w00 + sub[:win, 1:] * w01
            + sub[1:, :win] * w10 + sub[1:, 1:] * w11)


def _lk_level(im0, im1, pts0, guess, win: int, iters: int, eps: float,
              min_eig: float, margin: int):
    """One pyramid level of LK for all points. pts0: positions in im0;
    guess: current flow estimates (positions in im1)."""
    size = win + 3 + 2 * margin
    size = min(size, min(im0.shape))  # tiny images: shrink the patch
    # Shrink the window with the patch: _sample_window dynamic_slices
    # (win+1, win+1) out of the patch and clips the start to
    # [r, size-r-2], so size < win+1 fails to compile and sizes just
    # above it invert the clip bounds. win = size-1 keeps the slice
    # exactly patch-sized and the clip range non-empty.
    win = max(min(win, size - 1), 1)
    patches0, org0 = _crop_patches(im0, pts0, size)
    patches1, org1 = _crop_patches(im1, guess, size)

    dx = jnp.array([0.5, 0.0])
    dy = jnp.array([0.0, 0.5])

    def prepare_one(p0, pat0):
        c0 = p0
        patch0 = _sample_window(pat0, c0, win)
        ix = (_sample_window(pat0, c0 + dx, win)
              - _sample_window(pat0, c0 - dx, win))
        iy = (_sample_window(pat0, c0 + dy, win)
              - _sample_window(pat0, c0 - dy, win))
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
        return patch0, ix, iy, ok, Ginv

    patch0, ix, iy, ok, Ginv = jax.vmap(prepare_one)(
        pts0 - org0, patches0)

    def step_one(pos, done, pat1, o1, p0w, ixw, iyw, G):
        patch1 = _sample_window(pat1, pos - o1, win)
        di = p0w - patch1
        b = jnp.array([jnp.sum(di * ixw), jnp.sum(di * iyw)])
        d = G @ b
        pos_new = jnp.where(done, pos, pos + d)
        return pos_new, done | (jnp.linalg.norm(d) < eps)

    # early exit once every point has converged (typical sequences
    # converge in a few iterations; the fixed fori_loop always paid for
    # ``iters``) — masked updates make this identical to the full unroll
    def cond(c):
        i, _, done = c
        return (i < iters) & ~jnp.all(done)

    def body(c):
        i, pos, done = c
        pos, done = jax.vmap(step_one)(pos, done, patches1, org1,
                                       patch0, ix, iy, Ginv)
        return i + 1, pos, done

    _, pos, _ = jax.lax.while_loop(
        cond, body, (0, guess, jnp.logical_not(ok)))

    # A track whose final position sits at the patch-sampling clamp was
    # stopped short of its true displacement (per-level motion beyond the
    # margin) — mark it failed instead of returning a confidently-wrong
    # position (the gather formulation could walk arbitrarily far; cv2
    # culls such tracks through its error threshold). A clamp at the
    # true IMAGE border is exempt: there the patch edge coincides with
    # the image edge, matching the gather formulation's border clamp.
    r = win // 2
    h1, w1 = im1.shape
    loc = jnp.floor(pos - org1)
    lo_m = (loc < r) & (org1 > 0)
    hi_m = (loc > size - r - 2) & (org1 < jnp.array(
        [max(w1 - size, 0), max(h1 - size, 0)], jnp.float32)[None, :])
    ok = ok & ~(lo_m | hi_m).any(axis=1)

    def final_err(pos1, pat1, o1, p0w):
        return jnp.mean(jnp.abs(
            p0w - _sample_window(pat1, pos1 - o1, win)))

    err = jax.vmap(final_err)(pos, patches1, org1, patch0)
    return pos, ok, err


@functools.partial(
    jax.jit, static_argnames=("win", "levels", "iters", "margin"))
@pin_fp32
def pyramid_lk(im0: jnp.ndarray, im1: jnp.ndarray, pts: jnp.ndarray,
               win: int = 15, levels: int = 3, iters: int = 10,
               eps: float = 0.03, min_eig: float = 1e-4,
               margin: int = 8) -> FlowResult:
    """Track [N, 2] (x, y) points from im0 to im1 ([H, W] grayscale,
    float in [0, 1])."""
    im0 = im0.astype(jnp.float32)
    im1 = im1.astype(jnp.float32)
    pyr0 = [im0]
    pyr1 = [im1]
    for _ in range(levels - 1):
        # Clamp pyramid depth against the window (cv2 does the same
        # internally): a level smaller than the LK window can neither
        # hold a full sampling patch nor pass the texture check, so it
        # only poisons status for points the fine levels track fine.
        h, w = pyr0[-1].shape
        if min(h, w) // 2 < win + 3:
            break
        pyr0.append(_downsample(pyr0[-1]))
        pyr1.append(_downsample(pyr1[-1]))
    levels = len(pyr0)

    scale = 2.0 ** (levels - 1)
    guess = pts / scale
    status = jnp.ones(pts.shape[0], bool)
    err = jnp.zeros(pts.shape[0])
    for lv in range(levels - 1, -1, -1):
        p_lv = pts / (2.0 ** lv)
        guess, ok, err = _lk_level(
            pyr0[lv], pyr1[lv], p_lv, guess, win, iters, eps, min_eig,
            margin)
        status &= ok
        if lv > 0:
            guess = guess * 2.0

    h, w = im0.shape
    inb = ((guess[:, 0] >= 0) & (guess[:, 0] < w)
           & (guess[:, 1] >= 0) & (guess[:, 1] < h))
    return FlowResult(guess, status & inb, err)
