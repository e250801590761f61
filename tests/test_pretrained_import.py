"""Pretrained-encoder import parity vs the reference's OWN loaders.

For each pretrained model type (imagenet18/50, moco50, timecycle, uvc) a
synthetic checkpoint is written in that family's exact key schema, loaded on
one side by the actual reference code (`make_encoder` /
`load_tc_model` / `load_uvc_model`, code/utils/__init__.py:248-351, run via
tests/_reference_shim.py) and on the other by this framework's importer
(videowalk_tpu/utils/pretrained.py) — then the two encoders' forward outputs
are compared on a fixed clip. Proves key munging, OIHW->HWIO transposes,
running-stat import, and the inflated-conv squeeze all match.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videowalk_tpu.models.encoder import make_encoder
from videowalk_tpu.utils.pretrained import (PRETRAINED_TYPES,
                                            apply_pretrained_encoder,
                                            load_pretrained_state)

from _reference_shim import load_reference, reference_args

torch = pytest.importorskip("torch")


def _randomized_state(net, seed=0):
    """state_dict with randomized weights AND running stats (fresh BN stats
    are all-0/all-1, which would mask a batch_stats import bug)."""
    rng = np.random.RandomState(seed)
    state = net.state_dict()
    out = {}
    for k, v in state.items():
        if k.endswith("num_batches_tracked"):
            out[k] = v.clone()
        elif k.endswith("running_var"):
            out[k] = torch.from_numpy(
                rng.uniform(0.5, 1.5, tuple(v.shape)).astype(np.float32))
        else:
            out[k] = torch.from_numpy(
                (rng.randn(*v.shape) * 0.05).astype(np.float32))
    return out


def _forward_pair(model_type, ckpt_path, ref_net, depth18=True, hw=64):
    """Run reference torch encoder vs our imported flax encoder on one clip."""
    rng = np.random.RandomState(42)
    x = rng.randn(1, 3, 2, hw, hw).astype(np.float32)  # (B, C, T, h, w)

    ref = load_reference()
    From3D = ref["utils"].From3D
    tnet = From3D(ref_net).eval()
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(x)).numpy()  # (B, C', T, H, W)

    spec = make_encoder(model_type, pretrained_path=ckpt_path)
    variables = spec.init_params(jax.random.PRNGKey(0), img_size=hw)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 4, 1))  # (B, T, h, w, 3)
    f_out = np.asarray(spec.module.apply(variables, x_nhwc, train=False))
    # (B, T, H, W, C') -> (B, C', T, H, W)
    f_out = f_out.transpose(0, 4, 1, 2, 3)

    assert t_out.shape == f_out.shape, (t_out.shape, f_out.shape)
    np.testing.assert_allclose(f_out, t_out, rtol=2e-4, atol=2e-5)


def _reference_encoder(model_type, tmp_path, monkeypatch):
    """Run the reference's own make_encoder for `model_type` against a
    synthetic local checkpoint; returns (torch trunk net, ckpt path)."""
    ref = load_reference()
    ref_resnet = ref["resnet"]
    ref_utils = ref["utils"]

    if model_type in ("imagenet18", "imagenet50"):
        base = (ref_resnet.resnet18() if model_type == "imagenet18"
                else ref_resnet.resnet50())
        state = _randomized_state(base, seed=1)
        path = os.path.join(tmp_path, f"{model_type}.pth")
        torch.save(state, path)
        # the reference downloads this state by URL (code/resnet.py:57-63)
        monkeypatch.setattr(ref_resnet, "load_state_dict_from_url",
                            lambda url, progress=True: torch.load(
                                path, weights_only=False))
    elif model_type == "moco50":
        base = ref_resnet.resnet50()
        state = _randomized_state(base, seed=2)
        wrapped = {f"module.encoder_q.{k}": v for k, v in state.items()}
        # MoCo's MLP head keys: must be skipped by both loaders
        wrapped["module.encoder_q.fc.0.weight"] = torch.zeros(2048, 2048)
        wrapped["module.encoder_q.fc.2.weight"] = torch.zeros(128, 2048)
        # momentum-encoder keys: filtered out by the prefix match
        wrapped["module.encoder_k.conv1.weight"] = torch.ones(64, 3, 7, 7)
        path = os.path.join(tmp_path, "moco_v2_800ep_pretrain.pth.tar")
        torch.save({"state_dict": wrapped}, path)
    elif model_type == "timecycle":
        base = ref_resnet.resnet50()
        state = _randomized_state(base, seed=3)
        wrapped = {}
        for k, v in state.items():
            if k.endswith("num_batches_tracked"):
                # 0-d tensors break the reference's `tmp[:]` copy — real tc
                # files don't carry them (code/utils/__init__.py:261-266)
                continue
            # inflate conv weights to 5D (O, I, 1, kh, kw): the tc ckpt is a
            # 3D-conv video encoder; the loader squeezes the temporal axis
            if v.ndim == 4 and "conv" in k:
                v = v[:, :, None]
            wrapped[f"module.encoderVideo.{k}"] = v
        path = os.path.join(tmp_path, "tc_checkpoint.pth.tar")
        torch.save({"state_dict": wrapped}, path)
    elif model_type == "uvc":
        base = ref_resnet.resnet18()
        state = _randomized_state(base, seed=4)
        wrapped = {f"module.gray_encoder.{k}": v for k, v in state.items()
                   if not k.startswith("fc.")}  # strict load w/ fc=None
        path = os.path.join(tmp_path, "uvc_checkpoint.pth.tar")
        torch.save({"state_dict": wrapped}, path)
    else:
        raise AssertionError(model_type)

    # the reference's tc/uvc/moco loaders read hardcoded cwd-relative names
    monkeypatch.chdir(tmp_path)
    args = reference_args(model_type=model_type)
    tnet = ref_utils.make_encoder(args)  # applies modify(): stride-1, no fc
    return tnet.model, path  # unwrap the reference's From3D


@pytest.mark.parametrize("model_type", ["imagenet18", "uvc"])
def test_pretrained_parity_r18(model_type, tmp_path, monkeypatch):
    trunk, path = _reference_encoder(model_type, str(tmp_path), monkeypatch)
    _forward_pair(model_type, path, trunk)


@pytest.mark.slow
@pytest.mark.parametrize("model_type", ["imagenet50", "moco50", "timecycle"])
def test_pretrained_parity_r50(model_type, tmp_path, monkeypatch):
    trunk, path = _reference_encoder(model_type, str(tmp_path), monkeypatch)
    _forward_pair(model_type, path, trunk)


def test_missing_path_raises_actionably():
    variables = {"params": {}, "batch_stats": {}}
    with pytest.raises(ValueError, match="pretrained-path"):
        apply_pretrained_encoder(variables, "moco50", "")


def test_wrong_schema_raises(tmp_path):
    torch.save({"state_dict": {"unrelated.weight": torch.zeros(3)}},
               os.path.join(tmp_path, "bad.pth"))
    with pytest.raises(ValueError, match="no keys matching"):
        load_pretrained_state("moco50", os.path.join(tmp_path, "bad.pth"))


def test_apply_to_full_crw_variables(tmp_path, monkeypatch):
    """The CLI path: import into a full CRW variables tree (encoder tower
    prefix 'encoder.model.'), head untouched, encoder changed."""
    trunk, path = _reference_encoder("uvc", str(tmp_path), monkeypatch)

    from videowalk_tpu.models import CRW, CRWConfig

    cfg = CRWConfig(model_type="uvc", pretrained_path=path, head_depth=0)
    model = CRW(cfg)
    x = jnp.zeros((1, 2, 4, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    new_vars = apply_pretrained_encoder(variables, "uvc", path, verbose=False)
    before = np.asarray(
        variables["params"]["encoder"]["model"]["conv1"]["kernel"])
    after = np.asarray(
        new_vars["params"]["encoder"]["model"]["conv1"]["kernel"])
    assert not np.array_equal(before, after)
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["head"]["fc0"]["kernel"]),
        np.asarray(new_vars["params"]["head"]["fc0"]["kernel"]))


def test_pretrained_types_cover_reference_surface():
    # the 5 reference model types that load checkpoints
    # (code/utils/__init__.py:313-330)
    assert set(PRETRAINED_TYPES) == {
        "imagenet18", "imagenet50", "moco50", "timecycle", "uvc"}
