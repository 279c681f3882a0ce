"""Native runtime: C++ union-find vs Python fallback, prefetch loader."""
import numpy as np

from onepose_tpu.runtime import native
from onepose_tpu.runtime.loader import PrefetchLoader


def test_native_builds_and_matches_fallback():
    rng = np.random.default_rng(0)
    n = 500
    edges = rng.integers(0, n, (800, 2)).astype(np.int64)

    lib = native.load_library()
    got = native.uf_components(n, edges)

    # force the Python fallback for comparison
    saved_lib, saved_tried = native._LIB, native._TRIED
    native._LIB, native._TRIED = None, True
    try:
        ref = native.uf_components(n, edges)
    finally:
        native._LIB, native._TRIED = saved_lib, saved_tried

    np.testing.assert_array_equal(got, ref)
    # canonical roots: every root is the min of its component
    for r in np.unique(got):
        members = np.where(got == r)[0]
        assert members.min() == r
    # the C++ library should actually be present in this environment
    assert lib is not None, "g++ toolchain expected in this image"


def test_uf_components_chain():
    edges = np.array([[0, 1], [1, 2], [3, 4]], np.int64)
    roots = native.uf_components(6, edges)
    np.testing.assert_array_equal(roots, [0, 0, 0, 3, 3, 5])


def test_prefetch_loader():
    paths = list(range(10))
    loader = PrefetchLoader(
        paths, lambda i: np.full((4, 4), i, np.float32), batch_size=4,
        depth=2)
    batches = list(loader)
    assert len(batches) == 3
    batch0, chunk0, n0 = batches[0]
    assert batch0.shape == (4, 4, 4) and n0 == 4
    np.testing.assert_allclose(batch0[2], 2.0)
    # tail batch padded by repeating the last item
    tail, chunk_t, n_t = batches[-1]
    assert n_t == 2 and tail.shape[0] == 4
    np.testing.assert_allclose(tail[3], tail[1])


def test_stage_ahead_order_and_errors():
    from onepose_tpu.runtime.loader import stage_ahead

    out = list(stage_ahead(iter(range(10)), lambda x: x * 2, depth=3))
    assert out == [x * 2 for x in range(10)]

    def bad(x):
        if x == 3:
            raise ValueError("boom")
        return x

    import pytest as _pytest
    with _pytest.raises(ValueError, match="boom"):
        list(stage_ahead(iter(range(10)), bad))


def test_stage_ahead_abandoned_consumer_stops_producer():
    """Breaking out of the consumption loop must stop the staging thread
    (no thread blocked forever on a full queue holding device batches)."""
    import threading
    import time as _time

    from onepose_tpu.runtime.loader import stage_ahead

    n_before = threading.active_count()
    gen = stage_ahead(iter(range(100)), lambda x: x, depth=2)
    for v in gen:
        if v >= 3:
            break
    gen.close()
    deadline = _time.time() + 5.0
    while threading.active_count() > n_before and _time.time() < deadline:
        _time.sleep(0.02)
    assert threading.active_count() <= n_before
