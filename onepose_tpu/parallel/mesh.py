"""Device-mesh and sharding helpers.

The reference's distributed layer is torch.distributed NCCL/gloo with
pickle-based object collectives (/root/reference/src/utils/comm.py:83-215),
consumed only by validation metric gathering. The TPU-native equivalent is a
``jax.sharding.Mesh`` with named axes; collectives are inserted by XLA from
sharding annotations (psum/all-gather over ICI), and structured metric arrays
replace the pickle path entirely.

Axes:
- ``data``:  batch (data parallelism; the reference's DDP analogue)
- ``model``: token/feature axis sharding for the matcher's 3D-point set —
  the natural "sequence parallel" axis if point budgets grow beyond a chip.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_shapes: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data", "model")) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    Default layout puts everything on ``data`` (model axis 1) — correct for
    the ~12M-param matcher; pass axis_shapes=(n//2, 2) etc. to exercise
    model-axis sharding.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if axis_shapes is None:
        axis_shapes = (n_devices, 1)
    if int(np.prod(axis_shapes)) != n_devices:
        raise ValueError(f"axis_shapes {axis_shapes} != {n_devices} devices")
    dev_array = np.asarray(devices).reshape(axis_shapes)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a pytree of host arrays with the batch axis over 'data'.

    Multi-process: each process passes its *local* slice of the global
    batch (global batch = local batch x process_count along axis 0);
    ``jax.make_array_from_process_local_data`` assembles the global array
    without any cross-host copy of the data itself."""
    sharding = data_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        batch)


def replicate(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
