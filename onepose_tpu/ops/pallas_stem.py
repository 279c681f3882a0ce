"""Pallas TPU kernel: fused SuperPoint stem.

The first SuperPoint block — conv1a(1→64) + ReLU + conv1b(64→64) + ReLU +
2x2 maxpool — runs at full image resolution, where XLA materializes each
conv's activations in HBM (~0.5 GB per conv per batch-8 at 512²). This
kernel keeps the whole block in VMEM: the image arrives as overlapping row
bands (2-pixel halo for the two 3x3 convs), conv1a is 9 broadcast
multiply-adds (single input channel), conv1b is 9 shifted [rows·W, 64] x
[64, 64] MXU matmuls, and only the pooled [H/2, W/2, 64] output is written
back.

Band preparation happens in XLA (an overlapping-band copy of the *input
image* — tiny next to the activation traffic saved) because this
environment's remote Mosaic compiler crashes on manual ANY-space DMA with
dynamic offsets; all kernel inputs are plain VMEM block specs. All widths
are multiples of 128 (odd trailing widths also crash the compile helper).

Weights arrive repacked: w1a [9, 64] (tap-major), w1b [9, 64, 64].
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(band_ref, w1a_ref, b1a_ref, w1b_ref, b1b_ref, out_ref,
            *, rows: int, H: int, W: int):
    """Grid: (B, H // rows). band_ref block: [1, 1, rows+4, W+256]."""
    ri = pl.program_id(1)
    row0 = ri * rows
    x = band_ref[0, 0]            # [rows+4, W+256]

    # conv1a (1→64): 9 broadcast multiply-adds into [rows+2, W+128, 64];
    # columns beyond W+2 are junk and masked below.
    wy = W + 128
    y1 = jnp.zeros((rows + 2, wy, 64), jnp.float32)
    for tap in range(9):
        dy, dx = tap // 3, tap % 3  # static offsets → static slices
        patch = x[dy:dy + rows + 2, dx:dx + wy]
        y1 = y1 + patch[:, :, None] * w1a_ref[tap][None, None, :]
    y1 = jnp.maximum(y1 + b1a_ref[...][None, None, :], 0.0)

    # conv1b's SAME padding zero-extends y1 beyond the image, whereas the
    # halo computed above is conv1a's *true* extension (nonzero where its
    # window overlaps the image). Zero the halo positions that lie outside
    # the image; inter-band halo rows (inside the image) keep true values.
    y1_row_global = jax.lax.broadcasted_iota(
        jnp.int32, (rows + 2, wy), 0) + (row0 - 1)
    y1_col = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, wy), 1)
    inside = ((y1_row_global >= 0) & (y1_row_global < H)
              & (y1_col >= 1) & (y1_col <= W))
    y1 = jnp.where(inside[:, :, None], y1, 0.0)

    # conv1b (64→64): 9 shifted MXU matmuls into [rows, W, 64].
    acc = jnp.zeros((rows * W, 64), jnp.float32)
    for tap in range(9):
        dy, dx = tap // 3, tap % 3
        shifted = y1[dy:dy + rows, dx:dx + W].reshape(rows * W, 64)
        acc = acc + jax.lax.dot_general(
            shifted, w1b_ref[tap],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    y2 = jnp.maximum(acc + b1b_ref[...][None, :], 0.0)
    y2 = y2.reshape(rows, W, 64)

    # 2x2 maxpool stride 2 → [1, rows/2, W/2, 64] (leading block batch dim)
    y2 = y2.reshape(rows // 2, 2, W // 2, 2, 64)
    out_ref[...] = jnp.max(y2, axis=(1, 3))[None]


def _kernel_tiled(band_ref, w1a_ref, b1a_ref, w1b_ref, b1b_ref, out_ref,
                  *, rows: int, wt: int, H: int, W: int):
    """Width-tiled variant. Grid: (B, H//rows, W//wt). band_ref block:
    [1, 1, 1, rows+4, wt+256] — the (row-band, col-tile) window with a
    2-px halo on every side, junk-padded to lane-aligned widths.

    Rationale: the whole-width kernel is crash mode (e) of DESIGN.md §6
    (the full conv1a+conv1b at W=512 kills the Mosaic compile helper in
    every formulation, while the same kernel compiles at W=128). Identical
    math per tile; only the grid and the halo bookkeeping change. conv1b
    dots pin ``Precision.HIGHEST`` so a compiling kernel can also be
    *numerically* exact vs the fp32 XLA stem — Mosaic's implicit-bf16
    matmul rewrite of broadcast accumulations (the silent-wrong mode) is
    then detectable by the runtime gate (models.superpoint.
    fused_stem_supported) as a conv1a-only deviation.
    """
    ri = pl.program_id(1)
    wi = pl.program_id(2)
    row0 = ri * rows
    col0 = wi * wt
    x = band_ref[0, 0, 0]         # [rows+4, wt+256]

    wy = wt + 128
    y1 = jnp.zeros((rows + 2, wy, 64), jnp.float32)
    for tap in range(9):
        dy, dx = tap // 3, tap % 3
        patch = x[dy:dy + rows + 2, dx:dx + wy]
        y1 = y1 + patch[:, :, None] * w1a_ref[tap][None, None, :]
    y1 = jnp.maximum(y1 + b1a_ref[...][None, None, :], 0.0)

    # zero conv1a's halo outside the IMAGE (SAME-padding semantics);
    # intra-image halo rows/cols keep their true values.
    y1_row = jax.lax.broadcasted_iota(
        jnp.int32, (rows + 2, wy), 0) + (row0 - 1)
    y1_col = jax.lax.broadcasted_iota(
        jnp.int32, (rows + 2, wy), 1) + (col0 - 1)
    inside = ((y1_row >= 0) & (y1_row < H)
              & (y1_col >= 0) & (y1_col < W))
    # zero by f32 multiply: Mosaic rejects minor-dim insertion on i1
    # vectors ("not a no-op only supported for 32-bit types"), so cast
    # BEFORE the [:, :, None] reshape and multiply instead of select.
    y1 = y1 * inside.astype(jnp.float32)[:, :, None]

    acc = jnp.zeros((rows * wt, 64), jnp.float32)
    for tap in range(9):
        dy, dx = tap // 3, tap % 3
        shifted = y1[dy:dy + rows, dx:dx + wt].reshape(rows * wt, 64)
        acc = acc + jax.lax.dot_general(
            shifted, w1b_ref[tap],
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    y2 = jnp.maximum(acc + b1b_ref[...][None, :], 0.0)
    y2 = y2.reshape(rows // 2, 2, wt // 2, 2, 64)
    out_ref[...] = jnp.max(y2, axis=(1, 3))[None]


@functools.partial(jax.jit, static_argnames=("rows", "wt", "interpret"))
def fused_stem_tiled(images: jnp.ndarray, w1a: jnp.ndarray,
                     b1a: jnp.ndarray, w1b: jnp.ndarray, b1b: jnp.ndarray,
                     rows: int = 32, wt: int = 128,
                     interpret: bool = False) -> jnp.ndarray:
    """Width-tiled fused stem: images [B, H, W, 1] → [B, H/2, W/2, 64].
    H divisible by ``rows``, W by ``wt``; rows, wt even."""
    b, H, W, _ = images.shape
    assert H % rows == 0 and rows % 2 == 0
    assert W % wt == 0 and wt % 2 == 0

    # pad: 2-px halo left/top; right pad so every [.., wt+256]-wide tile
    # window stays in bounds (last tile starts at W-wt+... needs
    # cols through (nw-1)*wt + wt + 256).
    n_bands = H // rows
    n_wt = W // wt
    img_pad = jnp.pad(images[..., 0], ((0, 0), (2, 2), (2, 254 + 128)))
    bands = jnp.stack(
        [jnp.stack([img_pad[:, i * rows: i * rows + rows + 4,
                            j * wt: j * wt + wt + 256]
                    for j in range(n_wt)], axis=1)
         for i in range(n_bands)], axis=1)  # [B, nb, nw, rows+4, wt+256]

    w1a_r = w1a.reshape(9, 64)
    w1b_r = w1b.reshape(9, 64, 64)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, n_bands, n_wt),
        in_specs=[
            pl.BlockSpec((1, 1, 1, rows + 4, wt + 256),
                         lambda bi, ri, wi: (bi, ri, wi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1a
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1a
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1b
        ],
        out_specs=pl.BlockSpec(
            (1, rows // 2, wt // 2, 64),
            lambda bi, ri, wi: (bi, ri, wi, 0),
            memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_kernel_tiled, rows=rows, wt=wt, H=H, W=W)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, H // 2, W // 2, 64),
                                       jnp.float32),
        interpret=interpret,
    )(bands, w1a_r, b1a, w1b_r, b1b)


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def fused_stem(images: jnp.ndarray, w1a: jnp.ndarray, b1a: jnp.ndarray,
               w1b: jnp.ndarray, b1b: jnp.ndarray, rows: int = 32,
               interpret: bool = False) -> jnp.ndarray:
    """images: [B, H, W, 1] fp32; w1a/w1b: HWIO conv weights
    ([3,3,1,64] / [3,3,64,64]); → pooled stem activations [B, H/2, W/2, 64].
    H must be divisible by ``rows``; H, W divisible by 2.
    """
    b, H, W, _ = images.shape
    assert H % rows == 0 and rows % 2 == 0

    # zero-pad (SAME for both convs) + lane-aligned width, then slice into
    # overlapping row bands (halo 4) so the kernel needs no manual DMA.
    img_pad = jnp.pad(images[..., 0], ((0, 0), (2, 2), (2, 254)))
    n_bands = H // rows
    bands = jnp.stack(
        [img_pad[:, i * rows: i * rows + rows + 4, :]
         for i in range(n_bands)], axis=1)  # [B, nb, rows+4, W+256]

    w1a_r = w1a.reshape(9, 64)
    w1b_r = w1b.reshape(9, 64, 64)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, n_bands),
        in_specs=[
            pl.BlockSpec((1, 1, rows + 4, W + 256),
                         lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1a
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1a
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1b
        ],
        out_specs=pl.BlockSpec(
            (1, rows // 2, W // 2, 64), lambda bi, ri: (bi, ri, 0, 0),
            memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_kernel, rows=rows, H=H, W=W)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, H // 2, W // 2, 64),
                                       jnp.float32),
        interpret=interpret,
    )(bands, w1a_r, b1a, w1b_r, b1b)
