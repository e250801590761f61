"""Checkpoint save -> restore -> identical step outputs (exact resume)."""

import os

import pytest

import numpy as np

import jax
import jax.numpy as jnp

from videowalk_tpu.models import CRW, CRWConfig
from videowalk_tpu.parallel import (TrainState, create_train_state,
                                    make_optimizer, make_train_step)
from videowalk_tpu.utils import load_checkpoint, save_checkpoint, partial_load


def test_resume_smoke_small():
    """Default-tier representative of the CLI-scale resume tests (ADVICE r2):
    tiny model, 2 steps, .pth round trip, bit-identical next-step loss."""
    cfg = CRWConfig(model_type="scratch_zeropad", temperature=0.05,
                    remove_layers=("layer3", "layer4"))
    model = CRW(cfg)
    opt = make_optimizer(lr=1e-3)
    rng = np.random.RandomState(0)
    batch = jnp.asarray(rng.randn(1, 3, 2, 16, 16, 3).astype(np.float32))
    state = create_train_state(model, opt, batch, jax.random.PRNGKey(0))
    step = make_train_step(model, opt, donate=False)
    for i in range(2):
        state, _ = step(state, batch, jax.random.PRNGKey(i))

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ck.pth")
        save_checkpoint(
            path,
            {"params": jax.device_get(state.params),
             "batch_stats": jax.device_get(state.batch_stats)},
            optimizer_state=jax.device_get(state.opt_state),
            lr_scheduler_state={"step": int(state.step)}, epoch=0, args={})
        _, m_direct = step(state, batch, jax.random.PRNGKey(9))
        fresh = create_train_state(model, opt, batch, jax.random.PRNGKey(5))
        ckpt = load_checkpoint(path)
        variables = partial_load(
            ckpt["model"],
            {"params": fresh.params, "batch_stats": fresh.batch_stats},
            verbose=False)
        restored = TrainState(
            params=variables["params"], batch_stats=variables["batch_stats"],
            opt_state=jax.tree_util.tree_map(jnp.asarray, ckpt["optimizer"]),
            step=jnp.asarray(ckpt["lr_scheduler"]["step"], jnp.int32))
        _, m_resumed = step(restored, batch, jax.random.PRNGKey(9))
    assert float(m_direct["loss"]) == float(m_resumed["loss"])


@pytest.mark.slow
def test_pth_checkpoint_resume_is_exact(tmp_path):
    """Train 2 steps -> save .pth -> restore into a FRESH state -> the next
    step's loss is bit-identical to continuing without the round trip
    (model weights + optimizer state + step counter all survive)."""
    cfg = CRWConfig(model_type="scratch_zeropad", temperature=0.05)
    model = CRW(cfg)
    opt = make_optimizer(lr=1e-3, milestones=(3,), gamma=0.1)
    rng = np.random.RandomState(0)
    batch = jnp.asarray(rng.randn(2, 3, 4, 32, 32, 3).astype(np.float32))
    state = create_train_state(model, opt, batch[:1], jax.random.PRNGKey(0))
    step = make_train_step(model, opt, donate=False)

    for i in range(2):
        state, _ = step(state, batch, jax.random.PRNGKey(i))

    # save through the reference-format .pth writer
    path = os.path.join(tmp_path, "checkpoint.pth")
    save_checkpoint(
        path,
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)},
        optimizer_state=jax.device_get(state.opt_state),
        lr_scheduler_state={"step": int(state.step)},
        epoch=0, args={})

    # continue WITHOUT the round trip
    cont, m_direct = step(state, batch, jax.random.PRNGKey(99))

    # restore into a fresh state and continue
    fresh = create_train_state(model, opt, batch[:1], jax.random.PRNGKey(7))
    ckpt = load_checkpoint(path)
    variables = {"params": fresh.params, "batch_stats": fresh.batch_stats}
    variables = partial_load(ckpt["model"], variables, verbose=False)
    restored = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=jax.tree_util.tree_map(jnp.asarray, ckpt["optimizer"]),
        step=jnp.asarray(ckpt["lr_scheduler"]["step"], jnp.int32))
    _, m_resumed = step(restored, batch, jax.random.PRNGKey(99))

    assert float(m_direct["loss"]) == float(m_resumed["loss"])


@pytest.mark.slow
def test_orbax_cli_resume_is_lossless(tmp_path):
    """--ckpt-format orbax then --resume <orbax_dir> THROUGH THE REAL CLI
    FLAGS restores params, batch_stats, optimizer state, and step bitwise
    (VERDICT r2 item 7: the lossless path was write-only)."""
    import cv2

    from videowalk_tpu.cli.train import main
    from videowalk_tpu.utils.arguments import train_args

    root = os.path.join(tmp_path, "kinetics_synth")
    d = os.path.join(root, "val_256")
    for cls in ("a",):
        os.makedirs(os.path.join(d, cls))
        for vi in range(2):
            w = cv2.VideoWriter(os.path.join(d, cls, f"v{vi}.mp4"),
                                cv2.VideoWriter_fourcc(*"mp4v"), 30.0,
                                (64, 64))
            rng = np.random.RandomState(vi)
            base = rng.randint(0, 255, (64, 64, 3), np.uint8)
            for t in range(60):
                w.write(np.roll(base, t * 3, axis=1))
            w.release()

    def argv(out, extra=()):
        return train_args([
            "--data-path", root, "--fast-test", "--frame-aug", "grid",
            "--clip-len", "4", "--model-type", "scratch_zeropad",
            "--img-size", "64", "--patch-size", "16", "16", "3",
            "--epochs", "1", "--steps-per-epoch", "2", "--prob", "1.0",
            "--cache-path", os.path.join(out, "cache.pt"),
            "--output-dir", os.path.join(out, "ckpt"),
            "--logs-dir", os.path.join(out, "logs"),
            "--frame-skip", "8", "--print-freq", "1",
            "--ckpt-format", "orbax", *extra])

    out_a = os.path.join(tmp_path, "a")
    state_a = main(argv(out_a))
    orbax_dir = os.path.join(out_a, "ckpt", "orbax_0")
    assert os.path.isdir(orbax_dir)

    # resume: start_epoch becomes 1 >= epochs, so main() returns the
    # restored state untouched — compare it bitwise against run A's final.
    out_b = os.path.join(tmp_path, "b")
    state_b = main(argv(out_b, ("--resume", orbax_dir)))

    assert int(np.asarray(state_a.step)) == int(np.asarray(state_b.step))
    for tree_a, tree_b in ((state_a.params, state_b.params),
                           (state_a.batch_stats, state_b.batch_stats),
                           (state_a.opt_state, state_b.opt_state)):
        la = jax.tree_util.tree_leaves(tree_a)
        lb = jax.tree_util.tree_leaves(tree_b)
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and the CONTINUATION is bit-identical: one more identical step on both
    from videowalk_tpu.models import CRW
    from videowalk_tpu.parallel import make_optimizer, make_train_step
    from videowalk_tpu.cli.train import model_config

    args = argv(os.path.join(tmp_path, "c"))
    model = CRW(model_config(args))
    opt = make_optimizer(args.lr, (), args.lr_gamma)
    step = make_train_step(model, opt, donate=False)
    rng = np.random.RandomState(3)
    batch = jnp.asarray(rng.randn(1, 4, 9, 16, 16, 3).astype(np.float32))
    _, m_a = step(state_a, batch, jax.random.PRNGKey(11))
    _, m_b = step(state_b, batch, jax.random.PRNGKey(11))
    assert float(m_a["loss"]) == float(m_b["loss"])
