"""Multi-host launcher.

The reference has no multi-host story (SURVEY §2.5: torch.distributed
process groups exist but no launcher, /root/reference/src/utils/comm.py).
The TPU-native entry is ``jax.distributed.initialize``: one Python process
per host, a coordinator address shared by all, and afterwards
``jax.devices()`` is the *global* device list — the mesh/pjit code is
unchanged, XLA routes collectives over ICI within a slice and DCN across.

Wire-up (train.py): every process runs the same command with
``parallel.coordinator=HOST:PORT parallel.num_processes=N
parallel.process_id=I`` (or the corresponding environment variables
``ONEPOSE_COORDINATOR`` / ``ONEPOSE_NUM_PROCESSES`` / ``ONEPOSE_PROCESS_ID``;
config takes precedence). Process 0 owns checkpointing and logging; data
loading is sharded per process (each process feeds its local slice of the
global batch via ``jax.make_array_from_process_local_data``).
"""
from __future__ import annotations

import os
from typing import Optional


def _cfg_or_env(parallel_cfg, key: str, env: str) -> Optional[str]:
    val = None
    if parallel_cfg is not None:
        val = parallel_cfg.get(key, None)
    if val is None:
        val = os.environ.get(env)
    return None if val in (None, "") else str(val)


def maybe_initialize(parallel_cfg=None) -> bool:
    """Initialize jax.distributed when a coordinator is configured.

    Returns True if multi-process mode was initialized. No-op (False) when
    no coordinator is given — the single-process path stays exactly as
    before, mirroring comm.py:22-27's world_size==1 degradation.
    """
    coordinator = _cfg_or_env(parallel_cfg, "coordinator",
                              "ONEPOSE_COORDINATOR")
    if coordinator is None:
        return False
    num_processes = _cfg_or_env(parallel_cfg, "num_processes",
                                "ONEPOSE_NUM_PROCESSES")
    process_id = _cfg_or_env(parallel_cfg, "process_id",
                             "ONEPOSE_PROCESS_ID")
    if num_processes is None or process_id is None:
        raise ValueError(
            "parallel.coordinator requires parallel.num_processes and "
            "parallel.process_id (or ONEPOSE_NUM_PROCESSES / "
            "ONEPOSE_PROCESS_ID)")

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_processes),
        process_id=int(process_id))
    return True
