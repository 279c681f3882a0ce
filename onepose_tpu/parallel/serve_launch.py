"""Multi-host pose serving.

The reference has no serving story at all (it evaluates one object per
process, /root/reference/inference.py); ``serving.PoseServer`` already
scales the catalog over a single-process device mesh. This module
extends it across *processes*: one Python process per host forms a
``jax.distributed`` world (``parallel.launch.maybe_initialize``), the
catalog is model-axis sharded over the GLOBAL mesh, and every request
batch is one SPMD dispatch in which all processes participate.

Design:

- **Process 0 owns the frontend.** It takes requests, pads them to the
  static batch, and broadcasts the host batch to every process with
  ``multihost_utils.broadcast_one_to_all`` — a device broadcast that
  rides the same ICI/DCN fabric as the compute, so there is no
  side-channel RPC layer to configure. The broadcast payload is
  fixed-shape ([B, H, W] images, [B, 3, 3] intrinsics, [B] object ids,
  scalar n_real/stop), so it compiles once.
- **Every process forms the global batch locally.** After the broadcast
  each process holds the full host batch and contributes its addressable
  shards via ``serving.put_global`` (data-axis sharded), exactly like the
  single-process mesh path.
- **Outputs are replicated.** The serve step is re-jitted with fully
  replicated ``out_shardings`` so every process can fetch results with a
  local ``np.asarray`` — no cross-process gather on the fetch path, and
  process 0 alone resolves client futures.

The per-request PRNG stream is derived from the shared seed, so a
multi-host server reproduces a single-process mesh server bit-for-bit
on the same request sequence (pinned by
tests/test_multihost.py::test_two_process_serving_matches_single_process).
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

import jax

from onepose_tpu import serving
from onepose_tpu.serving import PoseRequest


class MultiHostPoseServer(serving.PoseServer):
    """``serving.PoseServer`` over a multi-process mesh.

    ``mesh`` is required and must be built from the *global* device list
    (``jax.devices()`` after ``jax.distributed.initialize``) with
    ("data", "model") axes. Construction is collective: every process
    must build the server with the identical catalog and seed.
    """

    def __init__(self, *args, **kwargs):
        if kwargs.get("mesh") is None:
            raise ValueError("MultiHostPoseServer requires mesh=")
        super().__init__(*args, **kwargs)
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(self.mesh, P())
        self._serve_fn = jax.jit(
            serving._serve_step_impl,
            static_argnames=serving._SERVE_STATIC,
            out_shardings=rep)

    def encode_batch(self, requests: Sequence[PoseRequest]):
        """Pad a request list to the static batch and return HOST arrays
        (images [B,H,W,1], Ks [B,3,3], obj_idx [B], n_real) — the
        broadcast payload. Frontend-side (process 0) only. Delegates to
        the shared ``PoseServer._encode_host`` so the single- and
        multi-host batching semantics cannot drift."""
        images, Ks, obj_idx, n_real = self._encode_host(requests)
        return images, Ks, obj_idx, np.int32(n_real)

    def collective_infer(self, images, Ks, obj_idx, n_real) -> List[dict]:
        """One sharded serve dispatch. Collective: every process calls
        this with the identical host batch (post-broadcast)."""
        images = np.asarray(images, np.float32)
        if images.ndim == 3:
            images = images[..., None]
        staged = (self._put_data(images), self._put_data(Ks),
                  self._put_data(np.asarray(obj_idx, np.int32)),
                  int(n_real), False)
        out, n_real = self._launch(staged)
        return self._fetch(out, n_real)


def serve_forever(server: MultiHostPoseServer,
                  image_shape,
                  next_batch: Optional[Callable[[], Optional[
                      Sequence[PoseRequest]]]] = None,
                  deliver: Optional[Callable[[List[dict]], None]] = None,
                  ) -> int:
    """Collective serve loop; every process calls this and blocks until
    process 0's ``next_batch`` returns None.

    ``image_shape``: (H, W) all requests are validated against (the
    broadcast payload is fixed-shape). ``next_batch``/``deliver`` are
    consulted on process 0 only; other processes pass None. Returns the
    number of batches served.
    """
    from jax.experimental import multihost_utils as mhu

    B, (H, W) = server.batch_size, image_shape
    is_root = jax.process_index() == 0
    if is_root and next_batch is None:
        raise ValueError("process 0 must provide next_batch")

    zeros = (np.zeros((B, H, W, 1), np.float32),
             np.zeros((B, 3, 3), np.float32),
             np.zeros((B,), np.int32), np.int32(0))
    served = 0
    while True:
        stop = np.int32(0)
        payload = zeros
        err: Optional[BaseException] = None
        if is_root:
            # Any frontend error (unknown object name in encode_batch,
            # image-shape mismatch, a raising next_batch) must still
            # reach the broadcast: the other processes are already
            # blocked in broadcast_one_to_all, and skipping it would
            # wedge the whole fleet. Broadcast stop=1, then re-raise.
            try:
                reqs = next_batch()
                if reqs is None:
                    stop = np.int32(1)
                else:
                    payload = server.encode_batch(reqs)
                    if payload[0].shape[1:3] != (H, W):
                        raise ValueError(
                            f"request images {payload[0].shape[1:3]} != "
                            f"declared image_shape {(H, W)}")
            except BaseException as e:
                err = e
                stop = np.int32(1)
                payload = zeros
        stop, payload = mhu.broadcast_one_to_all((stop, payload),
                                                 is_source=is_root)
        if int(stop):
            if err is not None:
                raise err
            return served
        results = server.collective_infer(*payload)
        served += 1
        if is_root and deliver is not None:
            deliver(results)
