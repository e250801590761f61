"""Model-layer parity tests.

- flax ResNet vs. a torch.nn oracle rebuilt from torchvision semantics
  (same math as the reference's encoder, code/resnet.py) with synced weights.
- Superpixel pooling weights vs. an independent scipy/numpy oracle of the
  reference's window formulation (code/model.py:296-325).
- CRW model end-to-end shapes/grads on both node paths.
"""

import numpy as np
import pytest
import scipy.ndimage
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from videowalk_tpu.models import CRW, CRWConfig, CRWTeacherStudent, make_encoder
from videowalk_tpu.models.crw import superpixel_pool_weights, dilate_onehot
from videowalk_tpu.core.masks import make_dilation_kernel


# ------------------------------------------------------- torch oracle resnet


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride, padding_mode):
        super().__init__()
        pm = padding_mode if padding_mode else "zeros"
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False,
                                padding_mode=pm)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False,
                                padding_mode=pm)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        r = self.down(x) if self.down is not None else x
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + r)


class TorchResNet18(tnn.Module):
    """Oracle: torchvision-style ResNet-18 trunk after the reference's
    modify() (stride-1 layer3/4, optional reflect padding, no fc/avgpool)."""

    def __init__(self, padding_mode="zeros", remove_layers=()):
        super().__init__()
        pm = padding_mode
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False, padding_mode=pm)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        strides = {"layer1": 1, "layer2": 2, "layer3": 1, "layer4": 1}
        widths = {"layer1": 64, "layer2": 128, "layer3": 256, "layer4": 512}
        cin = 64
        self.stages = tnn.ModuleDict()
        for name in ["layer1", "layer2", "layer3", "layer4"]:
            if name in remove_layers:
                continue
            cout = widths[name]
            self.stages[name] = tnn.Sequential(
                TorchBasicBlock(cin, cout, strides[name], pm),
                TorchBasicBlock(cout, cout, 1, pm))
            cin = cout

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        for stage in self.stages.values():
            x = stage(x)
        return x


def _sync_block(tb, fp, fb):
    """Copy flax block params (fp=params, fb=batch_stats) into torch block."""
    def conv_w(p):
        return torch.from_numpy(np.asarray(p["kernel"]).transpose(3, 2, 0, 1))

    def bn(tmod, name):
        tmod.weight.data = torch.from_numpy(np.asarray(fp[name]["scale"]))
        tmod.bias.data = torch.from_numpy(np.asarray(fp[name]["bias"]))
        tmod.running_mean.data = torch.from_numpy(np.asarray(fb[name]["mean"]))
        tmod.running_var.data = torch.from_numpy(np.asarray(fb[name]["var"]))

    tb.conv1.weight.data = conv_w(fp["conv1"])
    tb.conv2.weight.data = conv_w(fp["conv2"])
    bn(tb.bn1, "bn1")
    bn(tb.bn2, "bn2")
    if tb.down is not None:
        tb.down[0].weight.data = conv_w(fp["downsample_conv"])
        bn(tb.down[1], "downsample_bn")


def sync_weights(tmodel, variables):
    fp = variables["params"]["model"]
    fb = variables["batch_stats"]["model"]
    tmodel.conv1.weight.data = torch.from_numpy(
        np.asarray(fp["conv1"]["kernel"]).transpose(3, 2, 0, 1))
    tmodel.bn1.weight.data = torch.from_numpy(np.asarray(fp["bn1"]["scale"]))
    tmodel.bn1.bias.data = torch.from_numpy(np.asarray(fp["bn1"]["bias"]))
    tmodel.bn1.running_mean.data = torch.from_numpy(np.asarray(fb["bn1"]["mean"]))
    tmodel.bn1.running_var.data = torch.from_numpy(np.asarray(fb["bn1"]["var"]))
    for name, stage in tmodel.stages.items():
        for i, blk in enumerate(stage):
            _sync_block(blk, fp[f"{name}_{i}"], fb[f"{name}_{i}"])


@pytest.mark.parametrize("padding_mode,remove_layers", [
    ("zeros", ()),
    ("reflect", ()),
    ("reflect", ("layer4",)),   # the reference's test-time encoder config
])
def test_resnet18_matches_torch_oracle(padding_mode, remove_layers):
    spec = make_encoder(
        {"zeros": "scratch_zeropad", "reflect": "scratch"}[padding_mode],
        remove_layers=remove_layers)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 1, 64, 64, 3).astype(np.float32)

    variables = spec.module.init(jax.random.PRNGKey(0),
                                 jnp.asarray(x), train=False)
    # Randomize BN affine + running stats so the oracle test is non-trivial.
    import flax
    variables = flax.core.unfreeze(variables)

    def perturb(path, leaf):
        r = np.random.RandomState(abs(hash(path)) % (2**31))
        if path.endswith("var"):
            return jnp.asarray(1.0 + 0.5 * r.rand(*leaf.shape).astype(np.float32))
        if path.endswith(("scale", "mean", "bias")):
            return jnp.asarray(r.randn(*leaf.shape).astype(np.float32) * 0.3
                               + (1.0 if path.endswith("scale") else 0.0))
        return leaf

    flat = flax.traverse_util.flatten_dict(variables)
    flat = {k: perturb("/".join(k), v) for k, v in flat.items()}
    variables = flax.traverse_util.unflatten_dict(flat)

    ours = spec.module.apply(variables, jnp.asarray(x), train=False)
    ours = np.asarray(ours)[:, 0].transpose(0, 3, 1, 2)  # -> NCHW

    tmodel = TorchResNet18(padding_mode, remove_layers).eval()
    sync_weights(tmodel, variables)
    with torch.no_grad():
        oracle = tmodel(torch.from_numpy(x[:, 0].transpose(0, 3, 1, 2))).numpy()

    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, rtol=1e-3, atol=5e-4)


def test_resnet18_geometry():
    spec = make_encoder("scratch")
    assert spec.hid_dim == 512 and spec.map_scale == 8
    spec4 = make_encoder("scratch", remove_layers=("layer4",))
    assert spec4.hid_dim == 256 and spec4.map_scale == 8


# ------------------------------------------------- superpixel pooling oracle


def oracle_pool_weights(sp_mask, max_sp, H, W, dilate_kernel=None):
    """Reference window formulation (code/model.py:296-320) in numpy/scipy."""
    B, T, h, w = sp_mask.shape
    wh, ww = h // H, w // W
    onehot = (sp_mask[:, :, None] == np.arange(max_sp)[None, None, :, None, None])
    onehot = onehot.astype(np.float64)
    if dilate_kernel is not None:
        se = np.asarray(dilate_kernel).astype(bool)
        for b in range(B):
            for t in range(T):
                for s in range(max_sp):
                    onehot[b, t, s] = scipy.ndimage.binary_dilation(
                        onehot[b, t, s].astype(bool), structure=se)
    counts = np.zeros((B, T, H, W, max_sp))
    for i in range(H):
        for j in range(W):
            counts[:, :, i, j, :] = onehot[
                :, :, :, i * wh:(i + 1) * wh, j * ww:(j + 1) * ww].sum((-1, -2))
    sp_size = onehot.sum((-1, -2))  # (B, T, SP)
    return counts / (sp_size[:, :, None, None, :] + 1e-20)


def random_sp_mask(B=2, T=2, h=32, w=32, nsp=9, seed=0):
    """Voronoi-ish dense superpixel ids."""
    rng = np.random.RandomState(seed)
    cy, cx = rng.rand(B, T, nsp) * h, rng.rand(B, T, nsp) * w
    yy, xx = np.mgrid[0:h, 0:w]
    d = ((yy[None, None, None] - cy[..., None, None]) ** 2
         + (xx[None, None, None] - cx[..., None, None]) ** 2)
    return np.argmin(d, axis=2).astype(np.int32)


def test_pool_weights_match_reference_window_formulation():
    mask = random_sp_mask()
    ours = np.asarray(superpixel_pool_weights(jnp.asarray(mask), 12, (8, 8)))
    oracle = oracle_pool_weights(mask, 12, 8, 8)
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-7)
    # Absent superpixel slots (ids 9..11 unused) give all-zero weights.
    assert np.all(ours[..., 9:] == 0)


@pytest.mark.parametrize("shape,size", [("L1", 5), ("cross", 7), ("circle", 5)])
def test_pool_weights_with_dilation_match_oracle(shape, size):
    mask = random_sp_mask(B=1, T=1, h=16, w=16, nsp=5, seed=3)
    kernel = np.asarray(make_dilation_kernel(size, shape))
    ours = np.asarray(superpixel_pool_weights(
        jnp.asarray(mask), 6, (4, 4), dilate=True,
        dilation_kernel_size=size, dilation_kernel_shape=shape))
    oracle = oracle_pool_weights(mask, 6, 4, 4, dilate_kernel=kernel)
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-7)


def test_dilate_onehot_l1_equals_conv_threshold():
    """The iterated-diamond fast path == the reference's conv>0 (any radius)."""
    mask = random_sp_mask(B=1, T=1, h=24, w=24, nsp=4, seed=5)
    onehot = (mask[:, :, None] == np.arange(4)[None, None, :, None, None])
    onehot = onehot.astype(np.float32)
    for size in (3, 7, 11):
        ours = np.asarray(dilate_onehot(jnp.asarray(onehot), size, "L1"))
        se = np.asarray(make_dilation_kernel(size, "L1")).astype(bool)
        for s in range(4):
            ref = scipy.ndimage.binary_dilation(
                onehot[0, 0, s].astype(bool), structure=se)
            np.testing.assert_array_equal(ours[0, 0, s].astype(bool), ref)


# --------------------------------------------------------------- CRW model


def test_crw_patch_path_end_to_end():
    cfg = CRWConfig(model_type="scratch_zeropad", temperature=0.05,
                    edgedrop_rate=0.1)
    model = CRW(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 4, 4, 32, 32, 3).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=True)
    (q, loss, diags), _ = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"])
    assert q.shape == (1, 128, 4, 4)
    assert np.isfinite(float(loss))
    assert "xent cyc r1" in diags and "acc cyc r2" in diags


def test_crw_superpixel_path_end_to_end():
    cfg = CRWConfig(model_type="scratch_zeropad", temperature=0.05,
                    max_sp_num=8)
    model = CRW(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 4, 32, 32, 3).astype(np.float32))
    mask = jnp.asarray(random_sp_mask(1, 4, 32, 32, nsp=6, seed=7))
    variables = model.init(jax.random.PRNGKey(0), x, sp_mask=mask, train=False)
    q, loss, diags = model.apply(variables, x, sp_mask=mask, train=False)
    assert q.shape == (1, 128, 4, 8)
    # Padded node slots (6..7) have exactly-zero embeddings.
    assert np.all(np.asarray(q)[:, :, :, 6:] == 0)
    assert np.isfinite(float(loss))


def test_crw_just_feats_whole_image():
    cfg = CRWConfig(model_type="scratch_zeropad")
    model = CRW(cfg)
    x = jnp.zeros((1, 2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    q, maps = model.apply(variables, x, just_feats=True, train=False)
    assert q.shape == (1, 128, 2, 16)       # 4x4 cells at 32px, scale 8
    assert maps.shape == (1, 2, 4, 4, 512)


@pytest.mark.slow
def test_crw_gradients_flow():
    cfg = CRWConfig(model_type="scratch_zeropad", temperature=0.05)
    model = CRW(cfg)
    x = jnp.asarray(np.random.RandomState(1)
                    .randn(1, 3, 3, 32, 32, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return out[1]

    grads = jax.grad(loss_fn)(variables["params"])
    gnorm = float(jnp.sqrt(sum(jnp.sum(jnp.square(g))
                               for g in jax.tree_util.tree_leaves(grads))))
    assert np.isfinite(gnorm) and gnorm > 0


@pytest.mark.slow
def test_teacher_student_end_to_end():
    cfg = CRWConfig(model_type="scratch_zeropad", temperature=0.05,
                    head_bias=True, use_zero_softmax=False)
    model = CRWTeacherStudent(cfg, alpha=0.3)
    x = jnp.asarray(np.random.RandomState(2)
                    .randn(1, 4, 3, 32, 32, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    q, loss, diags = model.apply(variables, x, train=False)
    assert q.shape == (1, 128, 4, 3)
    assert np.isfinite(float(loss))
    assert "crw_loss" in diags and "ts_loss" in diags

    # Teacher gets zero gradients (frozen via stop_gradient).
    def loss_fn(params):
        return model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=False)[1]

    grads = jax.grad(loss_fn)(variables["params"])
    tgrads = [g for k, g in grads.items() if k.startswith("teacher")]
    sgrads = [g for k, g in grads.items() if k.startswith("student")]
    tnorm = float(jnp.sqrt(sum(jnp.sum(jnp.square(g))
                               for g in jax.tree_util.tree_leaves(tgrads))))
    snorm = float(jnp.sqrt(sum(jnp.sum(jnp.square(g))
                               for g in jax.tree_util.tree_leaves(sgrads))))
    assert tnorm == 0.0 and snorm > 0
