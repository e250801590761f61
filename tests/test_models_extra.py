"""Additional model-layer parity: ResNet-50 (Bottleneck) torch oracle,
MLP heads, From3D time-folding, PCK numeric oracle."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from videowalk_tpu.models import make_encoder
from videowalk_tpu.models.crw import Head


class TorchBottleneck(tnn.Module):
    def __init__(self, cin, planes, stride, padding_mode):
        super().__init__()
        cout = planes * 4
        self.conv1 = tnn.Conv2d(cin, planes, 1, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False,
                                padding_mode=padding_mode or "zeros")
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, cout, 1, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        r = self.down(x) if self.down is not None else x
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(y + r)


class TorchResNet50Trunk(tnn.Module):
    """torchvision-style ResNet-50 trunk after the reference modify()."""

    def __init__(self, padding_mode="zeros"):
        super().__init__()
        pm = padding_mode
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False, padding_mode=pm)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        sizes = [3, 4, 6, 3]
        strides = [1, 2, 1, 1]   # layer3/4 stride 1 after modify()
        planes = [64, 128, 256, 512]
        cin = 64
        self.stages = tnn.ModuleList()
        for si in range(4):
            blocks = []
            for b in range(sizes[si]):
                stride = strides[si] if b == 0 else 1
                blocks.append(TorchBottleneck(cin, planes[si], stride, pm))
                cin = planes[si] * 4
            self.stages.append(tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for s in self.stages:
            x = s(x)
        return x


def _copy_bn(tmod, fp, fb, name):
    tmod.weight.data = torch.from_numpy(np.asarray(fp[name]["scale"]).copy())
    tmod.bias.data = torch.from_numpy(np.asarray(fp[name]["bias"]).copy())
    tmod.running_mean.data = torch.from_numpy(
        np.asarray(fb[name]["mean"]).copy())
    tmod.running_var.data = torch.from_numpy(
        np.asarray(fb[name]["var"]).copy())


def _conv_w(p):
    return torch.from_numpy(np.asarray(p["kernel"]).transpose(3, 2, 0, 1)
                            .copy())


@pytest.mark.slow
def test_resnet50_matches_torch_oracle():
    spec = make_encoder("imagenet50")  # weight import covered by
    # tests/test_pretrained_import.py; here random init vs torch oracle
    rng = np.random.RandomState(0)
    x = rng.randn(1, 1, 32, 32, 3).astype(np.float32)
    variables = spec.module.init(jax.random.PRNGKey(0), jnp.asarray(x),
                                 train=False)
    assert spec.hid_dim == 2048 and spec.map_scale == 8

    tmodel = TorchResNet50Trunk("zeros").eval()
    fp = variables["params"]["model"]
    fb = variables["batch_stats"]["model"]
    tmodel.conv1.weight.data = _conv_w(fp["conv1"])
    _copy_bn(tmodel.bn1, fp, fb, "bn1")
    sizes = [3, 4, 6, 3]
    for si in range(4):
        for b in range(sizes[si]):
            blk = tmodel.stages[si][b]
            bp = fp[f"layer{si + 1}_{b}"]
            bb = fb[f"layer{si + 1}_{b}"]
            blk.conv1.weight.data = _conv_w(bp["conv1"])
            blk.conv2.weight.data = _conv_w(bp["conv2"])
            blk.conv3.weight.data = _conv_w(bp["conv3"])
            _copy_bn(blk.bn1, bp, bb, "bn1")
            _copy_bn(blk.bn2, bp, bb, "bn2")
            _copy_bn(blk.bn3, bp, bb, "bn3")
            if blk.down is not None:
                blk.down[0].weight.data = _conv_w(bp["downsample_conv"])
                _copy_bn(blk.down[1], bp, bb, "downsample_bn")

    ours = spec.module.apply(variables, jnp.asarray(x), train=False)
    ours = np.asarray(ours)[:, 0].transpose(0, 3, 1, 2)
    with torch.no_grad():
        oracle = tmodel(torch.from_numpy(
            x[:, 0].transpose(0, 3, 1, 2).copy())).numpy()
    assert ours.shape == oracle.shape == (1, 2048, 4, 4)
    np.testing.assert_allclose(ours, oracle, rtol=1e-3, atol=1e-3)


def test_mlp_head_matches_torch_sequential():
    """head_depth=2 -> Linear/ReLU/Linear/ReLU/Linear (reference
    code/model.py:47-56 builds dims [hid, hid, hid, 128])."""
    head = Head(in_dim=32, depth=2, use_bias=False)
    x = np.random.RandomState(0).randn(5, 32).astype(np.float32)
    variables = head.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(head.apply(variables, jnp.asarray(x)))

    tseq = tnn.Sequential(
        tnn.Linear(32, 32, bias=False), tnn.ReLU(),
        tnn.Linear(32, 32, bias=False), tnn.ReLU(),
        tnn.Linear(32, 128, bias=False))
    with torch.no_grad():
        for i, k in zip((0, 2, 4), ("fc0", "fc1", "fc2")):
            tseq[i].weight.data = torch.from_numpy(
                np.asarray(variables["params"][k]["kernel"]).T.copy())
        oracle = tseq(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-6)


def test_from3d_time_folding_equivalence():
    """From3D(x) == per-frame application (code/utils/__init__.py:285-297)."""
    spec = make_encoder("scratch_zeropad")
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 32, 32, 3).astype(np.float32)
    variables = spec.module.init(jax.random.PRNGKey(0), jnp.asarray(x),
                                 train=False)
    folded = np.asarray(spec.module.apply(variables, jnp.asarray(x),
                                          train=False))
    per_frame = np.stack([
        np.asarray(spec.module.apply(variables, jnp.asarray(x[:, t:t + 1]),
                                     train=False))[:, 0]
        for t in range(3)], axis=1)
    np.testing.assert_allclose(folded, per_frame, rtol=1e-5, atol=1e-5)


def test_pck_numeric_oracle(tmp_path):
    """Exact PCK values for constructed predictions."""
    import cv2
    import scipy.io as sio

    from videowalk_tpu.eval.eval_pck import FEAT_RES, compute_pck

    H = W = 100
    vdir = tmp_path / "vid0"
    vdir.mkdir()
    cv2.imwrite(str(vdir / "00001.png"), np.zeros((H, W, 3), np.uint8))
    # GT: 15 joints on a diagonal, 3 frames
    gt = np.zeros((2, 15, 3))
    gt[0] = np.linspace(10, 80, 15)[:, None]
    gt[1] = np.linspace(10, 80, 15)[:, None]
    mat = tmp_path / "gt.mat"
    sio.savemat(str(mat), {"pos_img": gt + 1})
    fl = tmp_path / "list.txt"
    fl.write_text(f"{vdir} {mat}\n")

    # predictions in feature coords: exact for frames 1,2 (frame 0 skipped)
    pred = gt / W * FEAT_RES
    pred.dump(str(tmp_path / "0.dat"))
    res = compute_pck(str(fl), str(tmp_path))
    for th, v in res.items():
        assert v == 100.0, (th, v)


def test_bfloat16_encoder_train_step():
    """The flagship bench config runs the encoder trunk in bf16
    (bench.py: CRWConfig(dtype=jnp.bfloat16); walk math stays f32) — pin
    that the mixed-precision path trains: finite loss near the f32 loss,
    params still f32 after the update."""
    from videowalk_tpu.models import CRW, CRWConfig
    from videowalk_tpu.parallel import (create_train_state, make_optimizer,
                                        make_train_step)

    rng = np.random.RandomState(0)
    batch = jnp.asarray(rng.randn(2, 3, 4, 32, 32, 3).astype(np.float32))

    losses = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        cfg = CRWConfig(model_type="scratch_zeropad", temperature=0.05,
                        dtype=dtype,
                        remove_layers=("layer2", "layer3", "layer4"))
        model = CRW(cfg)
        optimizer = make_optimizer(lr=1e-3)
        state = create_train_state(model, optimizer, batch[:1],
                                   jax.random.PRNGKey(0))
        step = make_train_step(model, optimizer, donate=False)
        state, metrics = step(state, batch, jax.random.PRNGKey(7))
        losses[name] = float(metrics["loss"])
        assert np.isfinite(losses[name]), (name, losses[name])
        assert all(leaf.dtype == jnp.float32 for leaf in
                   jax.tree_util.tree_leaves(state.params)), name
    # bf16 trunk rounding perturbs the walk inputs but must not change the
    # loss regime
    np.testing.assert_allclose(losses["bf16"], losses["f32"], rtol=5e-2)


def test_selective_remat_matches_no_remat():
    """Selective remat (remat_stages) is pure graph surgery: loss AND
    gradients must match the no-remat model exactly (jax.checkpoint replays
    the same primitives, so anything beyond float-associativity noise means
    a stage was silently dropped or double-applied)."""
    from videowalk_tpu.models import CRW, CRWConfig
    from videowalk_tpu.parallel import (create_train_state, make_optimizer,
                                        make_train_step)

    rng = np.random.RandomState(1)
    batch = jnp.asarray(rng.randn(1, 3, 4, 32, 32, 3).astype(np.float32))

    got = {}
    for name, kw in (
            ("none", dict(remat=False)),
            ("all", dict(remat=True)),
            ("sel", dict(remat=True, remat_stages="layer1,layer2,layer3")),
    ):
        cfg = CRWConfig(model_type="scratch_zeropad", temperature=0.05, **kw)
        model = CRW(cfg)
        optimizer = make_optimizer(lr=1e-3)
        state = create_train_state(model, optimizer, batch[:1],
                                   jax.random.PRNGKey(0))
        step = make_train_step(model, optimizer, donate=False)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(7))
        flat = np.concatenate([np.asarray(x).ravel() for x in
                               jax.tree_util.tree_leaves(new_state.params)])
        got[name] = (float(metrics["loss"]), flat)

    for name in ("all", "sel"):
        np.testing.assert_allclose(got[name][0], got["none"][0], rtol=1e-6,
                                   err_msg=name)
        np.testing.assert_allclose(got[name][1], got["none"][1],
                                   rtol=1e-4, atol=1e-7, err_msg=name)


def test_remat_stages_typo_raises():
    """A typo'd stage name must fail loudly, not silently buy no memory."""
    from videowalk_tpu.models.resnet import _remat_stage_set

    with pytest.raises(ValueError, match="unknown stage"):
        _remat_stage_set("layer1,layer5")
    assert _remat_stage_set("all") == _remat_stage_set("")
    assert _remat_stage_set("layer2, layer4") == frozenset(
        {"layer2", "layer4"})
