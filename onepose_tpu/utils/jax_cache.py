"""Persistent XLA compilation cache for deployment surfaces.

The 81-object serving program costs ~837 s to compile on the tunneled AOT
toolchain (docs/DESIGN.md §11) — a restart must not pay that again. JAX's
persistent compilation cache keys on (HLO, compile options, backend
version) and is safe to delete at any time. The test suite and the
multichip dryrun already enable it (tests/conftest.py,
__graft_entry__.py); this helper gives CLI/serving surfaces the same
switch without making library import mutate global jax config.
"""
from __future__ import annotations

import os


def default_cache_dir() -> str:
    return os.environ.get(
        "ONEPOSE_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "onepose_tpu_jax"))


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_secs: float = 0.5) -> str:
    """Point jax at a persistent on-disk compilation cache. Call BEFORE
    the first compilation (entries compiled earlier are not back-filled).
    Returns the cache directory."""
    import jax

    cache_dir = cache_dir or default_cache_dir()
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return cache_dir
