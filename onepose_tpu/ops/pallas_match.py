"""Pallas TPU kernel: fused dual-softmax mutual-max matching.

The GATsSPG matching head (gats_spg.dual_softmax_match) computes
``conf = softmax_rows(S) * softmax_cols(S)`` over S = mdesc0 @ mdesc1^T /
scale and then row/column argmaxes — XLA materializes the [B, N1, N2] fp32
confidence matrix in HBM several times. At inference only the argmax
rows/columns and their confidence values are needed, so this kernel streams
S tile-by-tile out of two MXU matmul passes and never writes the matrix:

- phase 0 (grid sweep over N1 tiles): accumulate per-column max and
  sum-exp statistics in VMEM scratch;
- phase 1 (second sweep): recompute each tile, form the dual-softmax
  confidences locally, reduce row argmax/max directly and fold column
  argmax/max into scratch, writing them on the final step.

Inputs per batch element: mdesc0 [N1, D], mdesc1 [N2, D] (L2-normalized).
Outputs: row argmax/max of conf ([N1]), column argmax/max of conf ([N2]).
The cheap mutual-max/threshold logic stays in JAX.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(inv_scale_ref, d0_ref, d1_ref,
            idx0_ref, max0_ref, idx1_ref, max1_ref,
            col_max_ref, col_sum_ref, conf_col_max_ref, conf_col_idx_ref,
            *, tile_n1: int, n1: int, n2: int, n2_pad: int):
    phase = pl.program_id(0)
    ti = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    d0 = d0_ref[...]              # [tile_n1, D]
    d1 = d1_ref[...]              # [N2, D]
    s = jax.lax.dot_general(
        d0, d1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_scale_ref[0]          # [tile_n1, N2]

    # rows beyond n1 / columns beyond n2 (shape padding) must not pollute
    # the statistics
    row_ids = jax.lax.broadcasted_iota(
        jnp.int32, (tile_n1, n2_pad), 0) + ti * tile_n1
    row_valid = row_ids < n1
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_n1, n2_pad), 1)
    col_valid = col_ids < n2
    s = jnp.where(row_valid & col_valid, s, -jnp.inf)

    @pl.when(phase == 0)
    def _accumulate_col_stats():
        @pl.when(ti == 0)
        def _init():
            col_max_ref[...] = jnp.full_like(col_max_ref, -jnp.inf)
            col_sum_ref[...] = jnp.zeros_like(col_sum_ref)

        m_old = col_max_ref[...]                       # [1, N2]
        m_tile = jnp.max(s, axis=0, keepdims=True)
        m_new = jnp.maximum(m_old, m_tile)
        # rescale the running sum to the new max
        scale_old = jnp.where(
            jnp.isfinite(m_old), jnp.exp(m_old - m_new), 0.0)
        col_sum_ref[...] = col_sum_ref[...] * scale_old + jnp.sum(
            jnp.exp(s - m_new), axis=0, keepdims=True)
        col_max_ref[...] = m_new

    @pl.when(phase == 1)
    def _emit():
        @pl.when(ti == 0)
        def _init():
            conf_col_max_ref[...] = jnp.zeros_like(conf_col_max_ref)
            conf_col_idx_ref[...] = jnp.zeros_like(conf_col_idx_ref)

        # row softmax (full row available in-tile); padded rows are all
        # -inf — clamp their max to 0 so exp(-inf - 0) = 0, not NaN
        row_max = jnp.max(s, axis=1, keepdims=True)
        row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
        row_exp = jnp.exp(s - row_max)
        row_sum = jnp.sum(row_exp, axis=1, keepdims=True)
        p_row = row_exp / jnp.maximum(row_sum, 1e-30)

        # column softmax from the accumulated stats (padded columns have
        # col_max = -inf → clamp to avoid NaN; their conf is zeroed anyway)
        col_max = col_max_ref[...]
        col_max = jnp.where(jnp.isfinite(col_max), col_max, 0.0)
        p_col = jnp.exp(s - col_max) / jnp.maximum(
            col_sum_ref[...], 1e-30)
        conf = jnp.where(row_valid & col_valid, p_row * p_col, 0.0)

        idx0_ref[...] = jnp.argmax(conf, axis=1).astype(jnp.int32)[None, :]
        max0_ref[...] = jnp.max(conf, axis=1)[None, :]

        tile_col_max = jnp.max(conf, axis=0, keepdims=True)
        tile_col_idx = (jnp.argmax(conf, axis=0).astype(jnp.int32)
                        + ti * tile_n1)[None, :]
        better = tile_col_max > conf_col_max_ref[...]
        conf_col_idx_ref[...] = jnp.where(
            better, tile_col_idx, conf_col_idx_ref[...])
        conf_col_max_ref[...] = jnp.maximum(
            conf_col_max_ref[...], tile_col_max)

        @pl.when(ti == n_tiles - 1)
        def _write_cols():
            idx1_ref[...] = conf_col_idx_ref[...]
            max1_ref[...] = conf_col_max_ref[...]


@functools.partial(jax.jit, static_argnames=("tile_n1", "interpret"))
def dual_softmax_argmax(mdesc0: jnp.ndarray, mdesc1: jnp.ndarray,
                        scale_factor: float | jnp.ndarray,
                        tile_n1: int = 256,
                        interpret: bool = False):
    """Batched fused dual-softmax argmax.

    mdesc0: [B, N1, D]; mdesc1: [B, N2, D] → (indices0 [B,N1] int32,
    max0 [B,N1], indices1 [B,N2] int32, max1 [B,N2]) where max* are the
    dual-softmax confidences at the argmax positions.
    """
    b, n1, d = mdesc0.shape
    n2 = mdesc1.shape[1]
    n1_pad = ((n1 + tile_n1 - 1) // tile_n1) * tile_n1
    if n1_pad != n1:
        mdesc0 = jnp.pad(mdesc0, ((0, 0), (0, n1_pad - n1), (0, 0)))
    # Mosaic mis-compiles small trailing widths; keep N2 >= 256 and
    # lane-aligned (padded columns are masked out inside the kernel)
    n2_pad = max(((n2 + 127) // 128) * 128, 256)
    if n2_pad != n2:
        mdesc1 = jnp.pad(mdesc1, ((0, 0), (0, n2_pad - n2), (0, 0)))
    n_tiles = n1_pad // tile_n1
    inv_scale = jnp.reshape(
        1.0 / jnp.asarray(scale_factor, jnp.float32), (1,))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(2, n_tiles),
        in_specs=[
            pl.BlockSpec((tile_n1, d), lambda p, i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2_pad, d), lambda p, i, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # row outputs are kept 2-D (1, n) so the last-two-dims TPU
            # tiling constraint is satisfiable under vmap batching
            pl.BlockSpec((1, tile_n1), lambda p, i, s: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n1), lambda p, i, s: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n2_pad), lambda p, i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n2_pad), lambda p, i, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n2_pad), jnp.float32),   # col max of S
            pltpu.VMEM((1, n2_pad), jnp.float32),   # col sumexp of S
            pltpu.VMEM((1, n2_pad), jnp.float32),   # col max of conf
            pltpu.VMEM((1, n2_pad), jnp.int32),     # col argmax of conf
        ],
    )

    kernel = functools.partial(
        _kernel, tile_n1=tile_n1, n1=n1, n2=n2, n2_pad=n2_pad)

    def one(d0, d1):
        idx0, max0, idx1, max1 = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((1, n1_pad), jnp.int32),
                jax.ShapeDtypeStruct((1, n1_pad), jnp.float32),
                jax.ShapeDtypeStruct((1, n2_pad), jnp.int32),
                jax.ShapeDtypeStruct((1, n2_pad), jnp.float32),
            ],
            interpret=interpret,
        )(inv_scale, d0, d1)
        return idx0[0, :n1], max0[0, :n1], idx1[0, :n2], max1[0, :n2]

    return jax.vmap(one)(mdesc0, mdesc1)
