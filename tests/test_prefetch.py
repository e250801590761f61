"""DevicePrefetcher: order/content preservation, len, error propagation."""

import numpy as np
import pytest

from videowalk_tpu.data.prefetch import DevicePrefetcher


def _batches(n):
    out = []
    for i in range(n):
        rng = np.random.RandomState(i)
        views = {"grid": rng.randn(2, 3, 4).astype(np.float32)}
        out.append((views, np.full((2, 8, 8), i, np.int32), i))
    return out


def test_prefetcher_preserves_order_and_content():
    data = _batches(7)
    pre = DevicePrefetcher(data, size=3)
    assert len(pre) == 7
    seen = list(pre)
    assert len(seen) == 7
    for i, (views, sp, label) in enumerate(seen):
        np.testing.assert_array_equal(np.asarray(views["grid"]),
                                      data[i][0]["grid"])
        np.testing.assert_array_equal(np.asarray(sp), data[i][1])
        assert label == i
    # re-iterable (one thread per epoch)
    assert len(list(pre)) == 7


def test_prefetcher_propagates_loader_errors():
    class Boom:
        def __len__(self):
            return 3

        def __iter__(self):
            yield _batches(1)[0]
            raise RuntimeError("decode failed")

    pre = DevicePrefetcher(Boom(), size=2)
    it = iter(pre)
    next(it)
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_prefetcher_rejects_bad_size():
    with pytest.raises(ValueError):
        DevicePrefetcher([], size=0)


def test_prefetcher_early_exit_cancels_producer():
    """A consumer that stops iterating (steps-per-epoch break / step
    exception) must terminate the producer promptly — NOT drain the whole
    remaining loader through decode + device_put (ADVICE r2, prefetch.py)."""
    import time

    consumed = []

    class Slow:
        def __len__(self):
            return 200

        def __iter__(self):
            for i, item in enumerate(_batches(200)):
                consumed.append(i)
                yield item

    pre = DevicePrefetcher(Slow(), size=2)
    t0 = time.perf_counter()
    for k, _ in enumerate(pre):
        if k == 1:
            break  # early exit mid-epoch
    elapsed = time.perf_counter() - t0
    # Producer may legitimately run a few batches ahead (queue depth + one
    # in flight), but must not walk the remaining ~198.
    time.sleep(0.5)  # let any runaway producer show itself
    assert len(consumed) <= 8, f"producer drained {len(consumed)} batches"
    assert elapsed < 5.0


def test_prefetcher_wraps_dataloader_worker_failure():
    """Composed path: DataLoader worker raises -> DevicePrefetcher re-raises
    in the training loop (no hang)."""
    from videowalk_tpu.data.loader import DataLoader

    class BadDataset:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("corrupt sample")
            views = {"grid": np.zeros((2, 3), np.float32)}
            return views, np.zeros((2, 2), np.int32), 0

    loader = DataLoader(BadDataset(), batch_size=2, num_workers=2,
                        prefetch_batches=1)
    with pytest.raises(RuntimeError, match="corrupt sample"):
        for _ in DevicePrefetcher(loader, size=1):
            pass
