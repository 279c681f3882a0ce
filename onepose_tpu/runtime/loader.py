"""Double-buffered host→device input pipeline.

The reference feeds the GPU through torch DataLoader workers
(num_workers=16 train / 1 inference, /root/reference/inference.py:108). The
TPU equivalent here: background threads decode+preprocess frames (OpenCV's
C++ decoders release the GIL), batches are assembled into pinned numpy
buffers and device_put ahead of consumption, so the TPU never waits on host
IO — the "host does IO only" design rule of the port.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, List, Optional, Sequence

import numpy as np


class PrefetchLoader:
    """Iterate batches of preprocessed frames with background prefetch.

    paths: image paths (or arbitrary work items); load_fn: item → numpy
    array; batch_size frames per batch; depth: prefetched batches.
    """

    def __init__(self, paths: Sequence, load_fn: Callable,
                 batch_size: int = 8, depth: int = 2,
                 num_threads: int = 4, pad_tail: bool = True,
                 device_put: bool = False):
        self.paths = list(paths)
        self.load_fn = load_fn
        self.batch_size = batch_size
        self.depth = depth
        self.num_threads = num_threads
        self.pad_tail = pad_tail
        self.device_put = device_put

    def __len__(self):
        return (len(self.paths) + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator:
        batch_queue: "queue.Queue" = queue.Queue(maxsize=self.depth)
        chunks = [
            self.paths[i:i + self.batch_size]
            for i in range(0, len(self.paths), self.batch_size)
        ]

        def producer():
            import concurrent.futures as cf

            with cf.ThreadPoolExecutor(self.num_threads) as pool:
                for chunk in chunks:
                    arrays = list(pool.map(self.load_fn, chunk))
                    n_real = len(arrays)
                    if self.pad_tail:
                        while len(arrays) < self.batch_size:
                            arrays.append(arrays[-1])
                    batch = np.stack(arrays)
                    if self.device_put:
                        import jax

                        batch = jax.device_put(batch)
                    batch_queue.put((batch, chunk, n_real))
            batch_queue.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = batch_queue.get()
            if item is None:
                break
            yield item


def stage_ahead(batches: Iterator, stage_fn: Callable,
                depth: int = 2) -> Iterator:
    """Apply ``stage_fn`` (typically a sharded ``jax.device_put``) on a
    background thread ``depth`` batches ahead of consumption, overlapping
    host→device upload with the device step. JAX transfers are async from
    the caller's thread, so staging ahead keeps the copy engine busy while
    the previous step computes — on a bandwidth-limited link the loop cost
    becomes max(upload, step) instead of their sum.

    Order-preserving; exceptions from ``stage_fn`` or the source iterator
    re-raise at the consumption point.
    """
    out: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
    _end = object()
    stop = threading.Event()

    def producer():
        try:
            for b in batches:
                if stop.is_set():
                    return
                staged = stage_fn(b)
                # cooperative put: never block forever if the consumer
                # abandoned the generator (exception / GeneratorExit in
                # the caller's loop) — otherwise the thread and its
                # staged device batches leak for the process lifetime
                while not stop.is_set():
                    try:
                        out.put(staged, timeout=0.1)
                        break
                    except queue.Full:
                        continue
            if not stop.is_set():
                out.put(_end)
        except BaseException as e:  # re-raised by the consumer
            if not stop.is_set():
                out.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = out.get()
            if item is _end:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while not out.empty():  # drop staged batches so HBM frees
            try:
                out.get_nowait()
            except queue.Empty:
                break
        t.join()
