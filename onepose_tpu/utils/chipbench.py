"""Chained-scalar timing harness for the tunneled TPU backend.

The single source of truth for the r3 measurement protocol
(docs/DESIGN.md §8), shared by bench.py, scripts/profile_stages.py and
scripts/bench_serving.py so a protocol correction lands everywhere at
once:

- launches are async (~0.2 ms) but every host fetch costs a ~29 ms HTTP
  round trip, so each measurement chains ``n_iters`` launches through a
  scalar data dependency and fetches ONE scalar per block;
- each chained iteration must be ONE jitted scalar→scalar program —
  chaining several dispatches per iteration from Python lets
  slow-tunnel-hour per-dispatch overhead inflate the reading;
- every operand must be passed as an ARGUMENT, never closure-captured:
  captured device arrays become compile-time constants and XLA folds
  data-independent work out of the measurement (r3 finding — this hid
  an 8 ms PnP regression behind a 1.85 ms stage reading);
- the first chained block after compile absorbs a hidden warm-up
  (autotuning / first real execution) that can cost seconds — it is
  always thrown away.
"""
from __future__ import annotations

import time
from typing import Callable, List, Sequence

import numpy as np


def chain_blocks(f: Callable, operands: Sequence, n_iters: int = 20,
                 blocks: int = 8) -> List[float]:
    """Run ``blocks`` counted chained blocks of ``f(eps, *operands)``
    (plus one throwaway) and return ms-per-iteration for each counted
    block. ``f`` must be jitted, take a float32 scalar first and return
    a float32 scalar, and fold the scalar into its real operands (e.g.
    ``images + eps * 1e-30``) so no work is data-independent."""
    import jax.numpy as jnp

    np.asarray(f(jnp.float32(0.0), *operands))  # compile + first exec
    samples: List[float] = []
    for blk in range(blocks + 1):
        t0 = time.perf_counter()
        eps = jnp.float32(0.0)
        for _ in range(n_iters):
            eps = f(eps, *operands)
        np.asarray(eps)
        if blk > 0:  # first block = throwaway (hidden warm-up)
            samples.append((time.perf_counter() - t0) / n_iters * 1000)
    return samples


def chain_time(f: Callable, operands: Sequence, n_iters: int = 30,
               blocks: int = 3) -> float:
    """Best-of-blocks ms/call — for comparing implementation variants of
    one stage (the minimum is the least tunnel-noise-contaminated
    sample)."""
    return min(chain_blocks(f, operands, n_iters, blocks))
