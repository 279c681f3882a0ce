"""Distributed metric collectives.

Replaces the reference's torch.distributed comm layer
(/root/reference/src/utils/comm.py: NCCL/gloo process groups,
pickle+byte-tensor all_gather/gather, reduce_dict, synchronize) — whose only
consumer is validation metric aggregation — with the JAX equivalents:
structured-array collectives over the mesh/ICI instead of pickled objects.

Single-process (the common case here) degrades to no-ops, mirroring
comm.py:22-27.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def synchronize():
    """Barrier across processes (no-op single-process)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("onepose_tpu.synchronize")


def all_gather_arrays(tree):
    """All-gather a pytree of equal-shape numpy arrays across processes →
    pytree with a leading process axis. Structured arrays only (no pickle
    path — the reference's generic-object gather is an anti-pattern on TPU)."""
    if get_world_size() == 1:
        return jax.tree.map(lambda x: np.asarray(x)[None], tree)
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)


def reduce_dict(metrics: Dict[str, float], average: bool = True
                ) -> Dict[str, float]:
    """Reduce scalar metrics across processes (comm.py:231-258 contract)."""
    if get_world_size() == 1:
        return dict(metrics)
    keys = sorted(metrics.keys())
    vec = np.asarray([float(metrics[k]) for k in keys])
    gathered = all_gather_arrays(vec)  # [P, K]
    red = gathered.mean(axis=0) if average else gathered.sum(axis=0)
    return {k: float(v) for k, v in zip(keys, red)}


def shared_random_seed() -> int:
    """A seed agreed upon by all processes (comm.py:218-228 contract):
    process 0's draw is broadcast via the all-gather."""
    seed = np.random.randint(0, 2 ** 31)
    gathered = all_gather_arrays(np.asarray([seed]))
    return int(np.asarray(gathered).reshape(-1)[0])


def psum_metrics(values: Dict[str, jnp.ndarray], axis_name: str
                 ) -> Dict[str, jnp.ndarray]:
    """In-pjit scalar metric reduction over a mesh axis (use inside
    shard_map/pjit bodies; XLA lowers to an ICI all-reduce)."""
    return {k: jax.lax.psum(v, axis_name) for k, v in values.items()}
