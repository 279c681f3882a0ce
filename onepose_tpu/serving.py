"""Multi-object pose serving runtime.

Production-deployment layer with no reference counterpart (the reference
evaluates one object per process): a single compiled frame→pose program
serves *many* objects concurrently. All object DBs are padded to one static
``shape3d`` and stacked device-resident [O, ...]; each request carries an
object index that gathers its DB row inside the jit, so mixed-object batches
run in one dispatch. A background thread assembles batches (size- or
latency-triggered) and resolves futures — the serving pattern the prefetch
loader feeds.
"""
from __future__ import annotations

import functools
import queue
import threading
from concurrent.futures import Future
from typing import Dict, List, NamedTuple, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from onepose_tpu.datasets.anno import ObjectDB
from onepose_tpu.models import gats_spg, superpoint
from onepose_tpu.pipeline import PoseOutput, poses_from_matches


_SERVE_STATIC = ("sp_config_items", "gats_config_items",
                 "reproj_threshold", "num_hypotheses", "refine_iters",
                 "uniform")


def _serve_step_impl(sp_params, gats_params, db_stack, obj_idx, images, Ks,
                     keys, sp_config_items, gats_config_items,
                     reproj_threshold, num_hypotheses, refine_iters,
                     uniform=False):
    """One mixed-object batch. db_stack arrays are [O, ...]; obj_idx [B].

    ``uniform=True`` compiles the single-object fast path: every request
    in the batch shares obj_idx[0], so the DB row is gathered ONCE and
    broadcast. Measured at protocol shapes on chip (single-dispatch
    chain protocol, docs/DESIGN.md §8/§11): 23.96 vs 24.45 ms/batch-8 —
    the per-request gather is bandwidth-trivial, so this saves ~2%, not
    the large margin an earlier (protocol-flawed) measurement suggested.
    Kept because the selection is free: the serve loop picks the path at
    batch-assembly time, and production traffic is bursty per object, so
    uniform batches are the common case.
    """
    sp_cfg = dict(sp_config_items)
    det = superpoint.extract(sp_params, images, sp_cfg)

    b = images.shape[0]
    if uniform:
        def pick(arr):
            row = arr[obj_idx[0]]
            return jnp.broadcast_to(row[None], (b,) + row.shape)
    else:
        def pick(arr):
            return arr[obj_idx]

    data = {
        "descriptors2d_query": det.descriptors,
        # upcast AFTER the gather: a bf16-stored catalog moves half the
        # bytes; the matcher always computes in its configured dtype
        "descriptors3d_db": pick(
            db_stack["descriptors3d"]).astype(jnp.float32),
        "descriptors2d_db": pick(
            db_stack["descriptors2d_db"]).astype(jnp.float32),
        "mask2d": det.mask,
        "mask3d": pick(db_stack["mask3d"]),
    }
    match = gats_spg.forward(gats_params, data, dict(gats_config_items))

    pnp = poses_from_matches(
        det.keypoints, det.mask, match.matches0,
        pick(db_stack["keypoints3d"]), Ks, keys,
        reproj_threshold=reproj_threshold,
        num_hypotheses=num_hypotheses, refine_iters=refine_iters)
    return PoseOutput(
        poses=pnp.pose, num_inliers=pnp.num_inliers,
        num_matches=jnp.sum(match.matches0 >= 0, axis=1).astype(jnp.int32),
        success=pnp.success, matches0=match.matches0,
        keypoints2d=det.keypoints, descriptors2d=det.descriptors,
        kpt_mask=det.mask)


_serve_step = jax.jit(_serve_step_impl, static_argnames=_SERVE_STATIC)


def put_global(arr, mesh, spec):
    """Place a full host array as a global array sharded by ``spec``.

    Works on single-process AND multi-process meshes: every process
    supplies its addressable shards from the (identical) full host copy,
    so no process ever device_puts to a device it cannot address."""
    from jax.sharding import NamedSharding

    arr = np.asarray(arr)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


class PoseRequest(NamedTuple):
    object_name: str
    image: np.ndarray   # [H, W] grayscale in [0, 1]
    K: np.ndarray       # [3, 3]


class PoseServer:
    """Multi-object pose server.

    ``mesh``: optional ``jax.sharding.Mesh`` with ("data", "model") axes.
    When given, the stacked object DBs are sharded over the *model* axis
    along the object dimension — the catalog scales past one chip's HBM
    (18 MB fp32/object: one v5e holds ~800 objects, a sharded v5e-8 mesh
    ~6400) — and request batches are sharded over the *data* axis. The
    per-request object gather crosses the mesh as an XLA collective
    gather over ICI; everything else is unchanged. Without a mesh the
    stack is resident on the default device.
    """

    def __init__(self, sp_params, gats_params,
                 object_dbs: Dict[str, ObjectDB],
                 sp_config: Optional[dict] = None,
                 gats_config: Optional[dict] = None,
                 batch_size: int = 8,
                 max_latency_s: float = 0.02,
                 reproj_threshold: float = 5.0,
                 num_hypotheses: int = 512,
                 refine_iters: int = 5,
                 seed: int = 0,
                 mesh=None,
                 db_dtype: str = "float32",
                 uniform_fast_path: bool = False):
        """``db_dtype="bfloat16"`` stores the descriptor stacks in bf16:
        halves HBM per object (18.4 → 9.3 MB → ~1400 objects on one v5e)
        and halves the per-request gather traffic. Descriptors are
        L2-normalized unit vectors, so bf16 storage quantizes inputs at
        ~0.4% relative; match sets can shift at threshold boundaries —
        opt-in, validated by test_bf16_catalog_close_to_fp32. The
        matcher still computes in fp32 (upcast after the gather);
        keypoints3d stay fp32 (geometry).

        ``uniform_fast_path=True`` lets single-object batches take the
        broadcast fast path (``_serve_step_impl(uniform=True)``). Off by
        default: the path saves only ~2% per batch (gather is
        bandwidth-trivial, docs/DESIGN.md §11) but doubles serve-step
        compilations — minutes per compile on a slow AOT toolchain —
        the first time traffic mixes uniform and mixed batches."""
        if not object_dbs:
            raise ValueError("need at least one object DB")
        shapes = {db.keypoints3d.shape[0] for db in object_dbs.values()}
        leaves = {db.num_leaf for db in object_dbs.values()}
        if len(shapes) != 1 or len(leaves) != 1:
            raise ValueError(
                "all object DBs must share shape3d and num_leaf "
                f"(got shapes {shapes}, num_leaf {leaves})")

        self.mesh = mesh
        self.names = sorted(object_dbs)
        self.name_to_idx = {n: i for i, n in enumerate(self.names)}

        store_dtype = jnp.dtype(db_dtype)

        def stack(key):
            arr = np.stack(
                [np.asarray(getattr(object_dbs[n], key))
                 for n in self.names])
            if mesh is not None:
                # pad the object axis to a multiple of the model axis
                n_model = mesh.shape["model"]
                pad = (-arr.shape[0]) % n_model
                if pad:
                    arr = np.concatenate(
                        [arr, np.repeat(arr[-1:], pad, axis=0)])
            if key in ("descriptors3d", "descriptors2d_db"):
                arr = arr.astype(store_dtype)
            return arr

        if mesh is None:
            self.sp_params = sp_params
            self.gats_params = gats_params
            self.db_stack = {
                key: jax.device_put(jnp.asarray(stack(key)))
                for key in ("keypoints3d", "descriptors3d",
                            "descriptors2d_db", "mask3d")
            }
        else:
            from jax.sharding import PartitionSpec as P

            if batch_size % mesh.shape["data"] != 0:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by data axis "
                    f"{mesh.shape['data']}")
            self.sp_params = jax.tree.map(
                lambda a: put_global(a, mesh, P()), sp_params)
            self.gats_params = jax.tree.map(
                lambda a: put_global(a, mesh, P()), gats_params)
            self.db_stack = {}
            for key in ("keypoints3d", "descriptors3d",
                        "descriptors2d_db", "mask3d"):
                arr = stack(key)
                spec = P("model", *([None] * (arr.ndim - 1)))
                self.db_stack[key] = put_global(arr, mesh, spec)

        sp_cfg = dict(superpoint.DEFAULT_CONFIG)
        sp_cfg.update(sp_config or {})
        sp_cfg = superpoint.resolve_fused_stem(sp_cfg)
        gats_cfg = dict(gats_spg.DEFAULT_CONFIG)
        gats_cfg.update(gats_config or {})
        self.sp_config_items = tuple(sorted(sp_cfg.items()))
        self.gats_config_items = tuple(sorted(gats_cfg.items()))
        self.batch_size = batch_size
        self.max_latency_s = max_latency_s
        self.reproj_threshold = reproj_threshold
        self.num_hypotheses = num_hypotheses
        self.refine_iters = refine_iters
        self.uniform_fast_path = uniform_fast_path
        self.key = jax.random.PRNGKey(seed)
        # subclasses may swap in a re-jitted step (e.g. replicated
        # out_shardings for the multi-host server, parallel/serve_launch.py)
        self._serve_fn = _serve_step

        self._queue: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._worker: Optional[threading.Thread] = None

    # -- batch assembly / launch / fetch helpers -------------------------
    def _encode_host(self, requests: Sequence[PoseRequest]):
        """Pad a request list to the static batch size and stack HOST
        arrays (images [B,H,W,1], Ks [B,3,3], obj_idx [B], n_real).
        Shared by the local assembly path and the multi-host broadcast
        payload (parallel/serve_launch.py) so batching semantics cannot
        drift between the two."""
        n_real = len(requests)
        reqs = list(requests)
        while len(reqs) < self.batch_size:
            reqs.append(reqs[-1])
        reqs = reqs[: self.batch_size]
        images = np.stack(
            [np.asarray(r.image, np.float32) for r in reqs])[..., None]
        Ks = np.stack([np.asarray(r.K, np.float32) for r in reqs])
        obj_idx = np.asarray(
            [self.name_to_idx[r.object_name] for r in reqs], np.int32)
        return images, Ks, obj_idx, n_real

    def _assemble(self, requests: Sequence[PoseRequest], to_device: bool):
        """Pad to the static batch size and (optionally) start the async
        host→device upload. Returns (images, Ks, obj_idx, n_real)."""
        images, Ks, obj_idx, n_real = self._encode_host(requests)
        # single-object batches may take the broadcast fast path (opt-in;
        # the mesh path keeps the gather: the obj row lives on one model
        # shard)
        uniform = bool(
            self.uniform_fast_path and self.mesh is None
            and (obj_idx == obj_idx[0]).all())
        if to_device or self.mesh is not None:
            # device_put dispatches asynchronously: the transfer proceeds
            # while the caller keeps assembling/computing other batches.
            # With a mesh, request tensors shard over the data axis.
            images = self._put_data(images)
            Ks = self._put_data(Ks)
            obj_idx = self._put_data(obj_idx)
        return images, Ks, obj_idx, n_real, uniform

    def _put_data(self, arr):
        """Host→device for a request tensor: plain async device_put off
        the mesh path; data-axis sharded global array on it (works on
        single- and multi-process meshes alike)."""
        if self.mesh is None:
            return jax.device_put(arr)
        from jax.sharding import PartitionSpec as P

        return put_global(
            arr, self.mesh, P("data", *([None] * (np.ndim(arr) - 1))))

    def _launch(self, staged):
        """Dispatch one assembled batch; returns (PoseOutput, n_real)."""
        images, Ks, obj_idx, n_real, uniform = staged
        self.key, sub = jax.random.split(self.key)
        keys = jax.random.split(sub, self.batch_size)
        if self.mesh is not None:
            keys = self._put_data(np.asarray(keys))
        out = self._serve_fn(
            self.sp_params, self.gats_params, self.db_stack,
            jnp.asarray(obj_idx), jnp.asarray(images), jnp.asarray(Ks),
            keys, self.sp_config_items, self.gats_config_items,
            self.reproj_threshold, self.num_hypotheses, self.refine_iters,
            uniform=uniform)
        return out, n_real

    @staticmethod
    def _fetch(out, n_real: int) -> List[dict]:
        poses = np.asarray(out.poses)
        success = np.asarray(out.success)
        inliers = np.asarray(out.num_inliers)
        return [
            {"pose": poses[i] if success[i] else None,
             "num_inliers": int(inliers[i]),
             "success": bool(success[i])}
            for i in range(n_real)
        ]

    # -- synchronous API ------------------------------------------------
    def infer_batch(self, requests: Sequence[PoseRequest]) -> List[dict]:
        """Run a mixed-object batch synchronously. Pads the tail to the
        static batch size."""
        out, n_real = self._launch(self._assemble(requests, to_device=False))
        return self._fetch(out, n_real)

    def infer_many(self, requests: Sequence[PoseRequest],
                   depth: int = 2, max_in_flight: int = 4) -> List[dict]:
        """Pipelined inference over many requests (the production serving
        shape): a staging thread assembles batches and starts their
        host→device uploads ``depth`` ahead, compute launches as soon as a
        staged batch is available, and result fetches drain in a bounded
        window — upload of batch N+1, compute of batch N, and host fetch
        of batch N-k all overlap. Addresses the upload-bound serving
        finding of docs/DESIGN.md §11."""
        chunks = [list(requests[i:i + self.batch_size])
                  for i in range(0, len(requests), self.batch_size)]
        if not chunks:
            return []
        staged: "queue.Queue" = queue.Queue(maxsize=depth)

        def stager():
            for chunk in chunks:
                staged.put(self._assemble(chunk, to_device=True))
            staged.put(None)

        t = threading.Thread(target=stager, daemon=True)
        t.start()

        results: List[dict] = []
        pending: List = []
        while True:
            item = staged.get()
            if item is None:
                break
            pending.append(self._launch(item))
            if len(pending) > max_in_flight:
                out, n_real = pending.pop(0)
                results.extend(self._fetch(out, n_real))
        for out, n_real in pending:
            results.extend(self._fetch(out, n_real))
        t.join()
        return results

    # -- async API ------------------------------------------------------
    def start(self):
        self._worker = threading.Thread(target=self._serve_loop,
                                        daemon=True)
        self._worker.start()

    def stop(self):
        self._stop.set()
        if self._worker is not None:
            self._worker.join(timeout=5)

    def submit(self, request: PoseRequest) -> Future:
        fut: Future = Future()
        self._queue.put((request, fut))
        return fut

    def _serve_loop(self):
        while not self._stop.is_set():
            batch: List = []
            try:
                batch.append(self._queue.get(timeout=0.05))
            except queue.Empty:
                continue
            # batch up to size or latency budget
            import time as _time

            deadline = _time.monotonic() + self.max_latency_s
            while len(batch) < self.batch_size:
                remaining = deadline - _time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            reqs = [b[0] for b in batch]
            futs = [b[1] for b in batch]
            try:
                results = self.infer_batch(reqs)
                for fut, res in zip(futs, results):
                    fut.set_result(res)
            except Exception as e:  # pragma: no cover
                for fut in futs:
                    fut.set_exception(e)
