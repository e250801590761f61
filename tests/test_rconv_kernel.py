"""Pallas reflect-conv kernel vs reflect-pad+VALID oracle (interpret mode on
the CPU test platform; the same kernel compiles on TPU — used by the encoder
when VIDEOWALK_RCONV permits)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videowalk_tpu.ops.rconv_kernel import reflect_conv3x3, rconv_supported


def _oracle(x, w):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)


def _rand(shape, seed):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32))


@pytest.mark.parametrize("N,H,W,cin,cout", [
    (3, 8, 8, 16, 32),     # layer3/4-like (small channels for test speed)
    (2, 16, 16, 8, 8),     # layer1-like
    (9, 8, 8, 4, 16),      # batch vs small channels
    (17, 8, 8, 8, 8),      # batch not divisible by the tile
    (2, 32, 32, 4, 8),     # 256px superpixel-mode layer3/4 geometry
])
def test_forward_matches_oracle(N, H, W, cin, cout):
    x = _rand((N, H, W, cin), 0)
    w = _rand((3, 3, cin, cout), 1) * 0.1
    y = reflect_conv3x3(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_oracle(x, w)),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_oracle():
    N, H, W, cin, cout = 4, 8, 8, 8, 16
    x = _rand((N, H, W, cin), 2)
    w = _rand((3, 3, cin, cout), 3) * 0.1
    g = _rand((N, H, W, cout), 4)

    def loss_k(x, w):
        return jnp.sum(reflect_conv3x3(x, w) * g)

    def loss_o(x, w):
        return jnp.sum(_oracle(x, w) * g)

    dxk, dwk = jax.grad(loss_k, argnums=(0, 1))(x, w)
    dxo, dwo = jax.grad(loss_o, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dxk), np.asarray(dxo),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dwk), np.asarray(dwo),
                               rtol=1e-4, atol=1e-5)


def test_gradients_match_oracle_16px():
    """The layer1 16x16 shape: ring-fold indices differ from 8x8."""
    N, H, W, cin, cout = 2, 16, 16, 4, 8
    x = _rand((N, H, W, cin), 5)
    w = _rand((3, 3, cin, cout), 6) * 0.1
    g = _rand((N, H, W, cout), 7)
    dxk, dwk = jax.grad(
        lambda x, w: jnp.sum(reflect_conv3x3(x, w) * g), (0, 1))(x, w)
    dxo, dwo = jax.grad(
        lambda x, w: jnp.sum(_oracle(x, w) * g), (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dxk), np.asarray(dxo),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dwk), np.asarray(dwo),
                               rtol=1e-4, atol=1e-5)


def test_encoder_integration_matches_fallback(monkeypatch):
    """Full 'scratch' (reflect) encoder: VIDEOWALK_RCONV=on (kernel path,
    interpret mode here) vs off (materialized-pad fallback) — same outputs
    and parameter gradients."""
    from videowalk_tpu.models.encoder import make_encoder

    # 32px input -> 8x8 maps at layer1/2: the kernel path actually runs
    # (rconv_supported needs H, W >= 8 after the stem + maxpool)
    spec = make_encoder("scratch", remove_layers=("layer3", "layer4"))
    x = _rand((1, 1, 32, 32, 3), 11)
    variables = spec.module.init(jax.random.PRNGKey(0), x, train=False)

    def run(mode):
        monkeypatch.setenv("VIDEOWALK_RCONV", mode)

        def loss(v):
            return jnp.sum(spec.module.apply(v, x, train=False) ** 2)

        return loss(variables), jax.grad(
            lambda v: loss(v))(variables)

    y_on, g_on = run("on")
    y_off, g_off = run("off")
    np.testing.assert_allclose(float(y_on), float(y_off), rtol=1e-5)
    # accumulation-order noise amplifies through the stacked layers; the
    # strict per-op parity lives in the direct kernel tests above
    for a, b in zip(jax.tree_util.tree_leaves(g_on),
                    jax.tree_util.tree_leaves(g_off)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_supported_gate():
    assert rconv_supported(8, 8, 3, 1, 1)
    assert rconv_supported(16, 16, 3, 1, 1)
    assert not rconv_supported(8, 8, 3, 2, 1)    # stride 2
    assert not rconv_supported(8, 8, 7, 1, 3)    # stem
    assert not rconv_supported(4, 4, 3, 1, 1)    # too small for the fold
    assert not rconv_supported(64, 64, 3, 1, 1)  # VMEM-unfriendly, fallback


def test_stats_variant_matches_oracle():
    """reflect_conv3x3_stats: y parity plus exact per-channel moments
    (including zero contribution from the internal batch padding — N=5
    does not divide the block size), and gradients through a loss that
    touches y, s1, AND s2 (the BN backward shape)."""
    from videowalk_tpu.ops.rconv_kernel import reflect_conv3x3_stats

    N, H, W, cin, cout = 5, 8, 8, 8, 16
    x = _rand((N, H, W, cin), 12)
    w = _rand((3, 3, cin, cout), 13) * 0.1
    y, s1, s2 = reflect_conv3x3_stats(x, w)
    yo = _oracle(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yo),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1),
                               np.asarray(jnp.sum(yo, (0, 1, 2))),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2),
                               np.asarray(jnp.sum(yo ** 2, (0, 1, 2))),
                               rtol=1e-5, atol=1e-4)

    gy = _rand((N, H, W, cout), 14)
    a1 = _rand((cout,), 15)
    a2 = _rand((cout,), 16)

    def loss_k(x, w):
        y, s1, s2 = reflect_conv3x3_stats(x, w)
        return jnp.sum(y * gy) + jnp.sum(s1 * a1) + jnp.sum(s2 * a2)

    def loss_o(x, w):
        y = _oracle(x, w)
        return (jnp.sum(y * gy) + jnp.sum(jnp.sum(y, (0, 1, 2)) * a1)
                + jnp.sum(jnp.sum(y ** 2, (0, 1, 2)) * a2))

    dxk, dwk = jax.grad(loss_k, argnums=(0, 1))(x, w)
    dxo, dwo = jax.grad(loss_o, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dxk), np.asarray(dxo),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dwk), np.asarray(dwo),
                               rtol=1e-4, atol=1e-4)


def test_block_bn_fusion_matches_unfused(monkeypatch):
    """Stacked reflect BasicBlocks in TRAIN mode: VIDEOWALK_BN_FUSE auto
    (fused conv+stats kernel + FusedStatsBN) vs off (plain kernel + flax
    BatchNorm) — same outputs, same parameter gradients, same UPDATED
    batch_stats (the running-average semantics clone).

    Deliberately NO stem/maxpool in the fixture: max_pool over relu's
    exact zeros makes the backward DISCONTINUOUS (argmax ties flip under
    1e-7 perturbations — measured: a 1e-7 input scaling moves the unfused
    path's gradients by the same 0.3-2.3 the fused/unfused diff shows,
    while a float64 oracle sits on the fused side), so any elementwise
    gradient comparison through it is a knife-edge test of tie-breaking,
    not of this fusion. Block-level backward is smooth away from relu
    boundaries."""
    import flax.linen as nn

    from videowalk_tpu.models.resnet import BasicBlock

    class TwoBlocks(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool):
            x = BasicBlock(filters=16, padding_mode="reflect",
                           name="b0")(x, train)
            return BasicBlock(filters=16, padding_mode="reflect",
                              name="b1")(x, train)

    net = TwoBlocks()
    x = _rand((4, 8, 8, 16), 21) * 0.5
    monkeypatch.setenv("VIDEOWALK_RCONV", "on")
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    ct = _rand((4, 8, 8, 16), 22)

    def run(mode):
        monkeypatch.setenv("VIDEOWALK_BN_FUSE", mode)

        def loss(params):
            y, updates = net.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(y * ct), updates

        (l, updates), grads = jax.value_and_grad(
            loss, has_aux=True)(variables["params"])
        return l, updates, grads

    # three modes: auto = moment fold + input-affine/relu chain fold
    # (BNAffine + reflect_conv3x3_bnin_stats), stats = moment fold only,
    # off = flax BatchNorm throughout. All must agree.
    l_c, u_c, g_c = run("auto")
    l_f, u_f, g_f = run("stats")
    l_u, u_u, g_u = run("off")
    np.testing.assert_allclose(float(l_c), float(l_u), rtol=1e-5)
    np.testing.assert_allclose(float(l_f), float(l_u), rtol=1e-5)
    for tree_a, tree_b in ((u_c, u_u), (u_f, u_u)):
        for a, b in zip(jax.tree_util.tree_leaves(tree_a),
                        jax.tree_util.tree_leaves(tree_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
    for tree_a, tree_b in ((g_c, g_u), (g_f, g_u)):
        for a, b in zip(jax.tree_util.tree_leaves(tree_a),
                        jax.tree_util.tree_leaves(tree_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-3)


def test_resnet_bn_fusion_forward_and_stats_match(monkeypatch):
    """Full reflect ResNet-18 trunk in TRAIN mode, fused vs unfused:
    outputs and updated batch_stats agree (gradients are compared at the
    block level above — the stem maxpool makes full-net gradient
    comparison discontinuous, see test_block_bn_fusion_matches_unfused)."""
    from videowalk_tpu.models.resnet import resnet18

    net = resnet18(padding_mode="reflect",
                   remove_layers=("layer3", "layer4"))
    x = _rand((2, 32, 32, 3), 21)
    monkeypatch.setenv("VIDEOWALK_RCONV", "on")
    variables = net.init(jax.random.PRNGKey(0), x, train=False)

    def run(mode):
        monkeypatch.setenv("VIDEOWALK_BN_FUSE", mode)
        return net.apply(variables, x, train=True,
                         mutable=["batch_stats"])

    y_f, u_f = run("auto")
    y_u, u_u = run("off")
    # atol 5e-5: two stacked BNs rescale ~1e-7 moment reassociation noise
    # by 1/std twice (observed max 1.6e-5 on one element of 4096)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_u),
                               rtol=1e-3, atol=5e-5)
    for a, b in zip(jax.tree_util.tree_leaves(u_f),
                    jax.tree_util.tree_leaves(u_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_bnin_stats_variant_matches_oracle():
    """reflect_conv3x3_bnin_stats: conv of relu(a*x+b) with fused moments —
    forward, moments (pad-image masking exercised: N=5 pads with zero
    images whose xn = relu(b) != 0 must NOT contaminate the sums), and
    gradients w.r.t. x, a, b, AND w through a loss touching y, s1, s2."""
    from videowalk_tpu.ops.rconv_kernel import reflect_conv3x3_bnin_stats

    N, H, W, cin, cout = 5, 8, 8, 8, 16
    x = _rand((N, H, W, cin), 30)
    a = jnp.abs(_rand((cin,), 31)) + 0.5
    b = _rand((cin,), 32) * 0.3
    w = _rand((3, 3, cin, cout), 33) * 0.1

    def oracle(x, a, b, w):
        xn = jax.nn.relu(x * a + b)
        return _oracle(xn, w)

    y, s1, s2 = reflect_conv3x3_bnin_stats(x, a, b, w)
    yo = oracle(x, a, b, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yo),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1),
                               np.asarray(jnp.sum(yo, (0, 1, 2))),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2),
                               np.asarray(jnp.sum(yo ** 2, (0, 1, 2))),
                               rtol=1e-5, atol=1e-4)

    gy = _rand((N, H, W, cout), 34)
    c1 = _rand((cout,), 35)
    c2 = _rand((cout,), 36)

    def loss_k(x, a, b, w):
        y, s1, s2 = reflect_conv3x3_bnin_stats(x, a, b, w)
        return jnp.sum(y * gy) + jnp.sum(s1 * c1) + jnp.sum(s2 * c2)

    def loss_o(x, a, b, w):
        y = oracle(x, a, b, w)
        return (jnp.sum(y * gy) + jnp.sum(jnp.sum(y, (0, 1, 2)) * c1)
                + jnp.sum(jnp.sum(y ** 2, (0, 1, 2)) * c2))

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(x, a, b, w)
    go = jax.grad(loss_o, argnums=(0, 1, 2, 3))(x, a, b, w)
    for name, kk, oo in zip(("dx", "da", "db", "dw"), gk, go):
        np.testing.assert_allclose(np.asarray(kk), np.asarray(oo),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_kernel_route_gate_shape_knobs(monkeypatch):
    """rconv_kernel_routes auto-gate: 8x8 and 32x32 interiors by default
    (32x32 = the measured sp-config winner, tools/ab_sp32.py); ALLOW32=0
    kills it, ALLOW16 opts 16x16 in (interior + min_c constraints intact
    throughout). Backend pinned to 'tpu' so the gate logic itself is what's
    tested on the CPU suite."""
    from videowalk_tpu.ops import reflect_conv as rc

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    for var in ("VIDEOWALK_RCONV", "VIDEOWALK_RCONV_MIN_C",
                "VIDEOWALK_RCONV_ALLOW16", "VIDEOWALK_RCONV_ALLOW32"):
        monkeypatch.delenv(var, raising=False)

    assert rc.rconv_kernel_routes(8, 8, 512, 512)
    assert rc.rconv_kernel_routes(32, 32, 512, 512)     # default-on winner
    assert not rc.rconv_kernel_routes(8, 8, 256, 512)   # channel-changing
    assert not rc.rconv_kernel_routes(8, 8, 256, 256)   # below min_c
    assert not rc.rconv_kernel_routes(32, 32, 256, 256)  # min_c at 32 too
    assert not rc.rconv_kernel_routes(16, 16, 512, 512)  # 16 needs ALLOW16

    monkeypatch.setenv("VIDEOWALK_RCONV_ALLOW32", "0")   # kill switch
    assert not rc.rconv_kernel_routes(32, 32, 512, 512)
    assert rc.rconv_kernel_routes(8, 8, 512, 512)
    monkeypatch.delenv("VIDEOWALK_RCONV_ALLOW32")

    monkeypatch.setenv("VIDEOWALK_RCONV_MIN_C", "256")
    assert rc.rconv_kernel_routes(32, 32, 256, 256)
    monkeypatch.setenv("VIDEOWALK_RCONV_ALLOW16", "1")
    assert rc.rconv_kernel_routes(16, 16, 512, 512)

    monkeypatch.setenv("VIDEOWALK_RCONV", "off")
    assert not rc.rconv_kernel_routes(8, 8, 512, 512)
