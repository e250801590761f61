"""Fused-SLIC Pallas kernel vs. the XLA device SLIC (interpret mode on CPU;
the kernel compiles on TPU — see ops/slic_kernel.py STATUS note)."""

import numpy as np

import jax.numpy as jnp

from videowalk_tpu.ops.slic_device import slic
from videowalk_tpu.ops.slic_kernel import slic_fused


def quadrant(h=64, w=64, seed=0):
    rng = np.random.RandomState(seed)
    img = np.zeros((h, w, 3), np.float32)
    img[:h // 2, :w // 2] = [1, 0, 0]
    img[:h // 2, w // 2:] = [0, 1, 0]
    img[h // 2:, :w // 2] = [0, 0, 1]
    img[h // 2:, w // 2:] = [1, 1, 0]
    return np.clip(img + rng.rand(h, w, 3).astype(np.float32) * 0.05, 0, 1)



# Slow tier (round-5 pruning policy, CLAUDE.md): the fused per-frame SLIC
# kernel is a MEASURED LOSER vs the batched XLA slic_device path (its
# module docstring records the verdict); parity stays pinned here for
# future hardware only.
import pytest
pytestmark = pytest.mark.slow

def test_fused_slic_matches_xla():
    x = jnp.asarray(quadrant()[None])
    l_ref = np.asarray(slic(x, 9, 30.0))
    l_fused = np.asarray(slic_fused(x, 9, 30.0))
    assert (l_ref == l_fused).mean() > 0.99


def test_fused_slic_n_active():
    x = jnp.asarray(np.stack([quadrant(), quadrant(seed=1)]))
    labels = np.asarray(slic_fused(x, 9, 30.0, 10, True,
                                   jnp.asarray([9, 5])))
    assert labels[0].max() <= 8
    assert labels[1].max() <= 4
    assert len(np.unique(labels[1])) <= 5


def test_fused_slic_batch_and_lead_dims():
    x = jnp.asarray(np.stack([quadrant(seed=i) for i in range(4)])
                    .reshape(2, 2, 64, 64, 3))
    labels = np.asarray(slic_fused(x, 9, 30.0))
    assert labels.shape == (2, 2, 64, 64)
    assert labels.dtype == np.int32
