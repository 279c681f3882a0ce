"""Test configuration: run everything on a virtual 8-device CPU mesh.

Environment variables must be set before JAX initializes its backends, so this
module is imported (by pytest) before any test imports jax.
"""
import os
import sys

# Force CPU: the session env pins JAX_PLATFORMS to the TPU backend (and a
# sitecustomize registers it before any of our code runs), but tests need
# deterministic fp32 numerics and a virtual 8-device mesh. jax.config wins
# over the env var as long as no backend has been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by CPU XLA compiles
# of the same graphs; cache them across runs (safe to delete any time).
_cache_dir = os.environ.get(
    "ONEPOSE_TPU_JAX_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "onepose_tpu_jax"))
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Reference repo (read-only upstream); parity tests are skipped when absent.
REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "src"))
