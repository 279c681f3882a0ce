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
