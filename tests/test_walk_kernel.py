"""Fused Pallas walk kernel vs. the XLA reference path (interpret mode on
the CPU test platform; the same kernel compiles on TPU — see bench.py)."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from videowalk_tpu.core.walk import crw_walk_loss
from videowalk_tpu.ops.walk_kernel import fused_walk_loss


def rand_q(B=2, C=128, T=5, N=49, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(B, C, T, N).astype(np.float32)
    return jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))


def test_fused_matches_xla_loss_and_diags():
    q = rand_q()
    l_ref, d_ref = crw_walk_loss(q, 0.05)
    l_fused, d_fused = fused_walk_loss(q, 0.05)
    np.testing.assert_allclose(float(l_fused), float(l_ref), rtol=1e-5)
    for k in d_ref:
        np.testing.assert_allclose(float(d_fused[k]), float(d_ref[k]),
                                   rtol=1e-4, atol=1e-5)


def test_fused_gradients_match_xla_small():
    """Default-tier representative of the slow gradient-parity sweep
    (ADVICE r2): one small shape so a VJP regression surfaces without
    --runslow."""
    q = rand_q(B=1, C=32, T=3, N=16, seed=4)
    g_ref = jax.grad(lambda x: crw_walk_loss(x, 0.05)[0])(q)
    g_fused = jax.grad(lambda x: fused_walk_loss(x, 0.05)[0])(q)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_fused_gradients_match_xla():
    q = rand_q(seed=1)
    g_ref = jax.grad(lambda x: crw_walk_loss(x, 0.05)[0])(q)
    g_fused = jax.grad(lambda x: fused_walk_loss(x, 0.05)[0])(q)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_fused_with_dropout_finite_and_plausible():
    q = rand_q(T=6, seed=2)
    loss, diags = fused_walk_loss(q, 0.05, key=jax.random.PRNGKey(0),
                                  edgedrop_rate=0.1)
    assert np.isfinite(float(loss))
    # dropout perturbs but shouldn't explode relative to the clean loss
    clean, _ = fused_walk_loss(q, 0.05)
    assert abs(float(loss) - float(clean)) < 2.0
    g = jax.grad(lambda x: fused_walk_loss(
        x, 0.05, key=jax.random.PRNGKey(1), edgedrop_rate=0.1)[0])(q)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_fused_padded_nodes_noop():
    """Zero (padded) node embeddings don't change the loss of valid nodes
    when n_valid excludes them — the kernel's own padding path."""
    q = np.asarray(rand_q(N=40, seed=3))
    l40, _ = fused_walk_loss(jnp.asarray(q), 0.05)
    l_ref, _ = crw_walk_loss(jnp.asarray(q), 0.05)
    np.testing.assert_allclose(float(l40), float(l_ref), rtol=1e-5)


def test_fused_tiny_T():
    q = rand_q(T=2, seed=4)
    loss, diags = fused_walk_loss(q, 0.05)
    assert float(loss) == 0.0 and diags == {}




@pytest.mark.parametrize("T,N", [(3, 16), (4, 49), (6, 100), (8, 49)])
@pytest.mark.slow
def test_fused_shape_sweep(T, N):
    """Fused kernel == XLA path across clip lengths and node counts."""
    q = rand_q(B=2, T=T, N=N, seed=T * 100 + N)
    l_ref, _ = crw_walk_loss(q, 0.07)
    l_fused, _ = fused_walk_loss(q, 0.07)
    np.testing.assert_allclose(float(l_fused), float(l_ref), rtol=1e-5)
    g_ref = jax.grad(lambda x: crw_walk_loss(x, 0.07)[0])(q)
    g_fused = jax.grad(lambda x: fused_walk_loss(x, 0.07)[0])(q)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_crw_model_fused_flag():
    """fused_walk='on' (interpret mode on CPU) == fused_walk='off'."""
    from videowalk_tpu.models import CRW, CRWConfig

    x = jnp.asarray(np.random.RandomState(0)
                    .randn(1, 4, 4, 32, 32, 3).astype(np.float32))
    outs = {}
    for mode in ("off", "on"):
        cfg = CRWConfig(model_type="scratch_zeropad", temperature=0.05,
                        fused_walk=mode)
        model = CRW(cfg)
        v = model.init(jax.random.PRNGKey(0), x, train=False)
        q, loss, _ = model.apply(v, x, train=False)
        outs[mode] = float(loss)
    np.testing.assert_allclose(outs["on"], outs["off"], rtol=1e-5)


def test_crw_fused_on_rejects_unsupported_configs():
    """'on' means FORCE: unsupported configs raise instead of silently
    taking the XLA path (an A/B would compare XLA with itself). T > 10
    overflows the kernel's one-tile (8, 128) loss buffers; 'auto' falls
    back gracefully."""
    from videowalk_tpu.models import CRW, CRWConfig

    rng = np.random.RandomState(0)
    x11 = jnp.asarray(rng.randn(1, 11, 4, 32, 32, 3).astype(np.float32))
    x4 = x11[:, :4]
    cfg_on = CRWConfig(model_type="scratch_zeropad", fused_walk="on")
    model = CRW(cfg_on)
    v = model.init(jax.random.PRNGKey(0), x4, train=False)
    with pytest.raises(ValueError, match="clip_len > 10"):
        model.apply(v, x11, train=False)
    with pytest.raises(ValueError, match="fused_walk='on'"):
        cfg_flip = CRWConfig(model_type="scratch_zeropad",
                             fused_walk="on", flip=True)
        CRW(cfg_flip).apply(v, x4, train=False)
    # 'auto' handles both silently via the XLA path
    cfg_auto = CRWConfig(model_type="scratch_zeropad", fused_walk="auto")
    q, loss, _ = CRW(cfg_auto).apply(v, x11, train=False)
    assert np.isfinite(float(loss))
