"""Fused reflect-pad conv (ops/reflect_conv.py) vs pad-then-VALID oracle.

The fused path rewrites reflect-padded convs (reference code/resnet.py:30-36)
as a zero-SAME conv plus boundary-strip rewrites; it must be *exact* — same
forward, same input gradient, same kernel gradient — for every conv geometry
the encoder uses (3x3/s1/p1 block convs, 7x7/s2/p3 stem) and for odd sizes,
plus fall back cleanly on inputs too small for disjoint strips.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Slow tier (round-5 pruning policy, CLAUDE.md): every mode this file pins
# (VIDEOWALK_REFLECT_FUSE=always strip rewrite, =dots ring rewrite) is a
# MEASURED LOSER kept only as an exact, tested alternative for future
# hardware; the production default path is covered by the encoder parity
# tests in test_models.py and the rconv kernel tests.
pytestmark = pytest.mark.slow

from videowalk_tpu.ops.reflect_conv import reflect_conv2d
from videowalk_tpu.ops.reflect_pad import reflect_pad_hw


@pytest.fixture(autouse=True)
def _force_fused(monkeypatch):
    # The production path gates fusion on spatial size (strips only pay off
    # at large activations, ops/reflect_conv.py). Tests force the fused path
    # so the strip rewrite itself is what's checked at every geometry.
    monkeypatch.setenv("VIDEOWALK_REFLECT_FUSE", "always")


def _valid_conv(w, stride):
    # conv(x, padding) — the PadConv calling convention (shared kernel,
    # per-call padding; see ops/reflect_conv.py).
    def conv(x, padding="VALID"):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(stride, stride), padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)
    return conv


def _oracle(x, w, stride, pad):
    return _valid_conv(w, stride)(reflect_pad_hw(x, pad, pad))


GEOMS = [
    # (kernel, stride, pad, H, W) — encoder geometries + adversarial sizes
    (3, 1, 1, 32, 32),
    (3, 1, 1, 17, 23),      # odd, non-square
    (7, 2, 3, 64, 64),      # stem
    (7, 2, 3, 33, 47),      # stem, odd
    (3, 2, 1, 20, 20),      # strided block conv
    (5, 1, 2, 16, 16),
    (5, 3, 2, 25, 25),      # stride > pad
    (3, 1, 1, 4, 4),        # tiny (near-fallback)
    (7, 2, 3, 8, 8),        # tiny stem -> fallback path
]


@pytest.mark.parametrize("kernel,stride,pad,H,W", GEOMS)
def test_forward_matches_oracle(kernel, stride, pad, H, W):
    key = jax.random.PRNGKey(kernel * 100 + stride * 10 + pad)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (2, H, W, 3), jnp.float32)
    w = jax.random.normal(kw, (kernel, kernel, 3, 5), jnp.float32)
    got = reflect_conv2d(x, _valid_conv(w, stride), kernel, stride, pad)
    want = _oracle(x, w, stride, pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kernel,stride,pad,H,W",
                         [(3, 1, 1, 16, 16), (7, 2, 3, 33, 47),
                          (3, 2, 1, 20, 20)])
def test_gradients_match_oracle(kernel, stride, pad, H, W):
    key = jax.random.PRNGKey(7)
    kx, kw, kc = jax.random.split(key, 3)
    x = jax.random.normal(kx, (1, H, W, 2), jnp.float32)
    w = jax.random.normal(kw, (kernel, kernel, 2, 4), jnp.float32)

    def loss_fused(x, w):
        y = reflect_conv2d(x, _valid_conv(w, stride), kernel, stride, pad)
        return jnp.sum(y * jax.random.normal(kc, y.shape))

    def loss_oracle(x, w):
        y = _oracle(x, w, stride, pad)
        return jnp.sum(y * jax.random.normal(kc, y.shape))

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    gx_o, gw_o = jax.grad(loss_oracle, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_o),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_o),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("H,W", [(8, 8), (16, 16), (7, 9), (2, 5), (2, 2)])
def test_ring_dots_matches_oracle(H, W, monkeypatch):
    """The dots formulation (zero-SAME conv + einsum ring corrections,
    VIDEOWALK_REFLECT_FUSE=dots) is exact for every 3x3/s1/p1 shape,
    including the H=2 reflect edge case — forward AND both gradients."""
    from videowalk_tpu.ops.reflect_conv import PadConv

    monkeypatch.setenv("VIDEOWALK_REFLECT_FUSE", "dots")
    cin, cout = 3, 5
    key = jax.random.PRNGKey(H * 31 + W)
    kx, kc = jax.random.split(key)
    x = jax.random.normal(kx, (2, H, W, cin), jnp.float32)
    conv = PadConv(cout, 3, 1)
    params = conv.init(jax.random.PRNGKey(2), x, "VALID")
    w = params["params"]["kernel"]
    cot = jax.random.normal(kc, (2, H, W, cout), jnp.float32)

    def loss_dots(params, x):
        y = reflect_conv2d(x, lambda x, p: conv.apply(params, x, p), 3, 1, 1)
        return jnp.sum(y * cot), y

    def loss_oracle(w, x):
        return jnp.sum(_oracle(x, w, 1, 1) * cot), _oracle(x, w, 1, 1)

    (gp, gx), (_, y) = (
        jax.grad(lambda p, x: loss_dots(p, x)[0], argnums=(0, 1))(params, x),
        loss_dots(params, x))
    (gw_o, gx_o), (_, y_o) = (
        jax.grad(lambda w, x: loss_oracle(w, x)[0], argnums=(0, 1))(w, x),
        loss_oracle(w, x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_o),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_o),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp["params"]["kernel"]),
                               np.asarray(gw_o), rtol=1e-4, atol=1e-5)


def test_ring_dots_falls_back_off_scope(monkeypatch):
    """dots mode must leave non-3x3/s1/p1 geometries on the exact fallback."""
    monkeypatch.setenv("VIDEOWALK_REFLECT_FUSE", "dots")
    for kernel, stride, pad, H, W in [(7, 2, 3, 16, 16), (3, 2, 1, 20, 20)]:
        key = jax.random.PRNGKey(kernel)
        kx, kw = jax.random.split(key)
        x = jax.random.normal(kx, (1, H, W, 3), jnp.float32)
        w = jax.random.normal(kw, (kernel, kernel, 3, 4), jnp.float32)
        got = reflect_conv2d(x, _valid_conv(w, stride), kernel, stride, pad)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(_oracle(x, w, stride, pad)),
                                   rtol=1e-5, atol=1e-5)


def test_resnet_reflect_unchanged_by_fusion():
    """End-to-end: the reflect encoder's outputs are identical whether the
    strips path or the fallback (pad + VALID) executes — proven by shrinking
    the input below the fused-path guard and comparing jit outputs at a size
    where both paths run fused vs composed of the same conv params."""
    from videowalk_tpu.models.resnet import resnet18

    net = resnet18(padding_mode="reflect")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3), jnp.float32)
    params = net.init(jax.random.PRNGKey(1), x, train=False)
    y = net.apply(params, x, train=False)

    # Oracle: same params through a monkeypatched _pad_conv that always uses
    # reflect_pad + VALID (the round-1 formulation).
    import videowalk_tpu.models.resnet as R

    orig = R._pad_conv

    def pad_then_valid(x, features, kernel, stride, padding, padding_mode,
                       name, dtype=jnp.float32):
        import flax.linen as nn
        if padding > 0 and padding_mode == "reflect":
            x = reflect_pad_hw(x, padding, padding)
        elif padding > 0:
            x = jnp.pad(x, ((0, 0), (padding, padding),
                            (padding, padding), (0, 0)))
        return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                       padding="VALID", use_bias=False, dtype=dtype,
                       name=name)(x)

    R._pad_conv = pad_then_valid
    try:
        y_ref = net.apply(params, x, train=False)
    finally:
        R._pad_conv = orig
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
