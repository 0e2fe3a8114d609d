"""Host-IO overlap utilities (prefetch thread + writer pool)."""

import time

import pytest

from renderformer_tpu.utils.prefetch import AsyncWriter, prefetch


def test_prefetch_preserves_order_and_values():
    assert list(prefetch(range(100), depth=4)) == list(range(100))


def test_prefetch_propagates_source_errors():
    def gen():
        yield 1
        yield 2
        raise ValueError('boom')

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match='boom'):
        next(it)


def test_prefetch_overlaps_producer_with_consumer():
    """With depth 2, the producer runs ahead while the consumer works:
    total wall time must be well under the serial sum."""
    def slow_gen():
        for i in range(6):
            time.sleep(0.05)
            yield i

    t0 = time.time()
    for _ in prefetch(slow_gen(), depth=2):
        time.sleep(0.05)  # consumer work, overlapped with production
    elapsed = time.time() - t0
    assert elapsed < 0.5  # serial would be ~0.6s + overhead


def test_async_writer_runs_and_drains():
    out = {}
    w = AsyncWriter(max_workers=2)
    for i in range(20):
        w.submit(out.__setitem__, i, i * i)
    w.close()
    assert out == {i: i * i for i in range(20)}


def test_async_writer_raises_on_drain():
    def fail():
        raise OSError('disk full')

    w = AsyncWriter(max_workers=1)
    w.submit(fail)
    with pytest.raises(OSError, match='disk full'):
        w.drain()
