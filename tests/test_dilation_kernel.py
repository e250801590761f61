"""Pallas L1-dilation kernel vs the XLA decomposition / scipy oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videowalk_tpu.models.crw import dilate_onehot
from videowalk_tpu.ops.dilation_kernel import dilate_l1_pallas


def _oracle(mask, k):
    """Brute-force L1 dilation on the integer lattice."""
    r = k // 2
    h, w = mask.shape
    out = np.zeros_like(mask)
    ys, xs = np.nonzero(mask)
    for y, x in zip(ys, xs):
        for dy in range(-r, r + 1):
            budget = r - abs(dy)
            yy = y + dy
            if not 0 <= yy < h:
                continue
            lo, hi = max(0, x - budget), min(w, x + budget + 1)
            out[yy, lo:hi] = 1
    return out


@pytest.mark.parametrize("k", [5, 7, 12, 23, 55])
def test_kernel_matches_oracle(k):
    rng = np.random.RandomState(k)
    masks = (rng.rand(3, 40, 52) > 0.985).astype(np.float32)
    got = np.asarray(dilate_l1_pallas(jnp.asarray(masks), k, interpret=True))
    for i in range(masks.shape[0]):
        np.testing.assert_array_equal(got[i], _oracle(masks[i], k),
                                      err_msg=f"k={k} mask {i}")


def test_kernel_matches_xla_decomposition():
    rng = np.random.RandomState(0)
    masks = (rng.rand(2, 3, 4, 33, 47) > 0.98).astype(np.float32)
    xla = np.asarray(dilate_onehot(jnp.asarray(masks), 15, "L1"))
    flat = masks.reshape(-1, 33, 47)
    ker = np.asarray(dilate_l1_pallas(jnp.asarray(flat), 15,
                                      interpret=True)).reshape(xla.shape)
    np.testing.assert_array_equal(xla, ker)
