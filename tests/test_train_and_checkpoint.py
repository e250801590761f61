"""Train-step, sharding, and checkpoint round-trip tests (8-device CPU mesh)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videowalk_tpu.models import CRW, CRWConfig, CRWTeacherStudent
from videowalk_tpu.parallel import (
    create_train_state, make_mesh, make_optimizer, make_train_step,
    multistep_lr, replicate, shard_batch)
from videowalk_tpu.utils import (
    flax_to_torch_state, load_checkpoint, partial_load, save_checkpoint,
    torch_to_flax_state)


def tiny_batch(B=2, T=3, N=4, hw=32, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(B, T, N, hw, hw, 3).astype(np.float32))


def make_model_and_state(seed=0, **cfg_kwargs):
    cfg = CRWConfig(model_type="scratch_zeropad", temperature=0.05,
                    **cfg_kwargs)
    model = CRW(cfg)
    optimizer = make_optimizer(lr=1e-3, milestones=(1000,), gamma=0.3)
    state = create_train_state(model, optimizer, tiny_batch(B=1, seed=seed),
                               jax.random.PRNGKey(seed))
    return model, optimizer, state


@pytest.mark.slow
def test_train_step_reduces_loss():
    model, optimizer, state = make_model_and_state()
    step = make_train_step(model, optimizer, donate=False)
    batch = tiny_batch()
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert int(state.step) == 8


def test_multistep_lr_schedule():
    sched = multistep_lr(1.0, [10, 20], 0.1)
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(10)) == pytest.approx(0.1)
    assert float(sched(25)) == pytest.approx(0.01)


def test_sharded_step_matches_single_device_small():
    """Default-tier representative of the mesh-parity risk area (ADVICE r2):
    layer1-only encoder keeps the two CPU compiles cheap; the full-model
    sweep stays in the slow tier below."""
    model, optimizer, state = make_model_and_state(
        remove_layers=("layer2", "layer3", "layer4"))
    step = make_train_step(model, optimizer, donate=False)
    batch = tiny_batch(B=8)
    key = jax.random.PRNGKey(42)
    _, metrics_single = step(state, batch, key)
    mesh = make_mesh(8)
    with mesh:
        state_r = replicate(state, mesh)
        batch_s = shard_batch(batch, mesh)
        _, metrics_sharded = step(state_r, batch_s, key)
    np.testing.assert_allclose(float(metrics_single["loss"]),
                               float(metrics_sharded["loss"]), rtol=1e-5)


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    """Data-parallel step over the 8-device mesh == single-device step."""
    model, optimizer, state = make_model_and_state()
    step = make_train_step(model, optimizer, donate=False)
    batch = tiny_batch(B=8)
    key = jax.random.PRNGKey(42)

    _, metrics_single = step(state, batch, key)

    mesh = make_mesh(8)
    with mesh:
        state_r = replicate(state, mesh)
        batch_s = shard_batch(batch, mesh)
        _, metrics_sharded = step(state_r, batch_s, key)

    np.testing.assert_allclose(float(metrics_single["loss"]),
                               float(metrics_sharded["loss"]), rtol=1e-5)


@pytest.mark.slow
def test_superpixel_train_step():
    cfg = CRWConfig(model_type="scratch_zeropad", temperature=0.05,
                    max_sp_num=6)
    model = CRW(cfg)
    optimizer = make_optimizer(lr=1e-3)
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.randn(2, 3, 32, 32, 3).astype(np.float32))
    mask = jnp.asarray(rng.randint(0, 5, (2, 3, 32, 32)), jnp.int32)
    state = create_train_state(model, optimizer, video[:1],
                               jax.random.PRNGKey(0), sp_mask=mask[:1])
    step = make_train_step(model, optimizer, with_sp_mask=True, donate=False)
    state, metrics = step(state, video, jax.random.PRNGKey(1), mask)
    assert np.isfinite(float(metrics["loss"]))
    # Regression: padded superpixel slots must not poison gradients with
    # 0 * NaN through l2_normalize (params stay finite after the update).
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    state, metrics = step(state, video, jax.random.PRNGKey(2), mask)
    assert np.isfinite(float(metrics["loss"]))


def test_l2_normalize_zero_gradient():
    """Zero vectors get zero (not NaN) gradients — torch 2-norm semantics."""
    from videowalk_tpu.core.walk import l2_normalize

    g = jax.grad(lambda x: jnp.sum(l2_normalize(x, -1) ** 2))(jnp.zeros((3, 4)))
    assert float(jnp.abs(g).max()) == 0.0


# ----------------------------------------------------------- checkpointing


def test_torch_state_roundtrip():
    """flax -> torch keys -> flax is the identity."""
    model, optimizer, state = make_model_and_state()
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    tstate = flax_to_torch_state(variables)
    # Reference-style key names exist.
    assert "encoder.model.conv1.weight" in tstate
    assert "encoder.model.layer1.0.conv1.weight" in tstate
    assert "encoder.model.layer2.0.downsample.0.weight" in tstate
    assert "encoder.model.bn1.running_mean" in tstate
    assert "selfsim_fc.0.weight" in tstate
    assert tstate["encoder.model.conv1.weight"].shape == (64, 3, 7, 7)
    assert tstate["selfsim_fc.0.weight"].shape == (128, 512)

    restored = torch_to_flax_state(tstate, variables, verbose=False)
    for coll in ("params", "batch_stats"):
        a = jax.tree_util.tree_leaves(variables[coll])
        b = jax.tree_util.tree_leaves(restored[coll])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_partial_load_skip_keys():
    """skip_keys filter by torch-key substring (code/utils/__init__.py:234).

    Note the reference's test-time ``skip_keys=['head']`` (code/test.py:51)
    is a no-op on CRW checkpoints — the head's torch name is ``selfsim_fc``;
    it is effectively excluded by head_depth=-1 building no head. We filter
    by the actual torch key name here.
    """
    model, optimizer, state = make_model_and_state(seed=0)
    _, _, state2 = make_model_and_state(seed=1)
    v1 = {"params": state.params, "batch_stats": state.batch_stats}
    v2 = {"params": state2.params, "batch_stats": state2.batch_stats}
    tstate = flax_to_torch_state(v1)
    restored = partial_load(tstate, v2, skip_keys=["selfsim_fc"], verbose=False)
    # encoder got v1's weights...
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["encoder"]["model"]["conv1"]["kernel"]),
        np.asarray(v1["params"]["encoder"]["model"]["conv1"]["kernel"]))
    # ...but the head kept v2's.
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["head"]["fc0"]["kernel"]),
        np.asarray(v2["params"]["head"]["fc0"]["kernel"]))


def test_conv1_rename_shim():
    """Old-layout checkpoints use 'conv1.1.weight' (code/test.py:44-50)."""
    model, optimizer, state = make_model_and_state()
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    tstate = flax_to_torch_state(variables)
    renamed = {}
    for k, v in tstate.items():
        for conv in ("conv1", "conv2"):
            if k.endswith(f"{conv}.weight") and "layer" in k:
                k = k.replace(f"{conv}.weight", f"{conv}.1.weight")
        renamed["module." + k] = v  # plus DataParallel prefix
    restored = torch_to_flax_state(renamed, variables, verbose=False)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["encoder"]["model"]["layer1_0"]["conv1"]["kernel"]),
        np.asarray(variables["params"]["encoder"]["model"]["layer1_0"]["conv1"]["kernel"]))


def test_save_load_checkpoint_pth(tmp_path):
    """Reference .pth dict format round-trips through torch serialization
    (code/train.py:279-289 dict schema)."""
    model, optimizer, state = make_model_and_state()
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    path = os.path.join(tmp_path, "model_0.pth")
    save_checkpoint(path, variables, optimizer_state=state.opt_state,
                    lr_scheduler_state={"step": 5, "milestones": [10]},
                    epoch=3, args={"lr": 1e-3})
    ckpt = load_checkpoint(path)
    assert set(ckpt) == {"model", "optimizer", "lr_scheduler", "epoch", "args"}
    assert ckpt["epoch"] == 3 and ckpt["args"]["lr"] == 1e-3

    import torch
    assert isinstance(ckpt["model"]["encoder.model.conv1.weight"],
                      torch.Tensor)
    restored = torch_to_flax_state(ckpt["model"], variables, verbose=False)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["head"]["fc0"]["kernel"]),
        np.asarray(variables["params"]["head"]["fc0"]["kernel"]))


@pytest.mark.slow
def test_orbax_checkpoint_roundtrip(tmp_path):
    """Native orbax backend preserves the full training state (including
    optimizer state, which the .pth shim stores as a numpy pytree)."""
    from videowalk_tpu.utils.checkpoint import (load_checkpoint_orbax,
                                                save_checkpoint_orbax)

    model, optimizer, state = make_model_and_state()
    tree = {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": int(state.step)}
    d = os.path.join(tmp_path, "orbax_ckpt")
    save_checkpoint_orbax(d, tree, metadata={"epoch": 2})
    restored, meta = load_checkpoint_orbax(d)
    assert meta["epoch"] == 2
    for a, b in zip(jax.tree_util.tree_leaves(tree["params"]),
                    jax.tree_util.tree_leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state (adam mu/nu + count) round-trips too
    a_leaves = jax.tree_util.tree_leaves(tree["opt_state"])
    b_leaves = jax.tree_util.tree_leaves(restored["opt_state"])
    assert len(a_leaves) == len(b_leaves)
    for a, b in zip(a_leaves, b_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # an interrupted save (arrays present, sidecar missing) must fail
    # loudly — silently resuming at epoch 0 with epoch-N weights is worse
    os.remove(os.path.join(d, "metadata.json"))
    with pytest.raises(RuntimeError, match="interrupted"):
        load_checkpoint_orbax(d)


def test_teacher_student_torch_keys():
    cfg = CRWConfig(model_type="scratch_zeropad", head_bias=True,
                    use_zero_softmax=False)
    model = CRWTeacherStudent(cfg, alpha=0.5)
    x = tiny_batch(B=1)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    tstate = flax_to_torch_state(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]})
    assert "encoder.model.conv1.weight" in tstate          # student tower
    assert "teacher.encoder.model.conv1.weight" in tstate  # teacher tower
    assert "selfsim_fc.0.weight" in tstate and "selfsim_fc.0.bias" in tstate


def test_finite_loss_guard_aborts_on_nan():
    """The always-on guard in train_one_epoch raises FloatingPointError at
    the first print-freq fetch of a non-finite loss (VERDICT r2 item 8; the
    analogue of the reference's set_detect_anomaly, code/train.py:27)."""
    import types

    from videowalk_tpu.cli.train import train_one_epoch
    from videowalk_tpu.utils.arguments import train_args

    args = train_args([
        "--data-path", "/nonexistent", "--steps-per-epoch", "3",
        "--print-freq", "1", "--prob", "1.0", "--output-dir", ""])
    fake_state = types.SimpleNamespace(step=0)

    def nan_step(state, batch, key):
        return state, {"loss": jnp.float32(np.nan)}

    steps = {"patch": nan_step, "superpixel": nan_step, "milestones": []}
    views = {"grid": np.zeros((1, 2, 4, 8, 8, 3), np.float32)}
    loader = [(views, None, 0)] * 3
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        train_one_epoch(args, None, steps, fake_state, loader, epoch=0,
                        mesh=None, rng=jax.random.PRNGKey(0),
                        checkpoint_fn=None, device_slic_fn=None)


def test_debug_nans_flag_parses():
    from videowalk_tpu.utils.arguments import train_args

    assert train_args(["--data-path", "x", "--debug-nans"]).debug_nans
    assert not train_args(["--data-path", "x"]).debug_nans
