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
