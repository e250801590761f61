"""Tests: device augmentation ops, sk-targets path, visualization utils."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from videowalk_tpu.core import sk_targets_walk_loss
from videowalk_tpu.ops.augs_device import (
    color_jitter, extract_patch_grid, normalize, random_hflip,
    random_resized_crop, train_transform_device)
from videowalk_tpu.utils.visualize import (
    Visualize, compute_flow, make_grid, pca_feats)


def test_device_transform_triple_shapes():
    clip = jnp.asarray(np.random.RandomState(0)
                       .randint(0, 255, (2, 3, 96, 128, 3), np.uint8))
    out = train_transform_device(jax.random.PRNGKey(0), clip,
                                 img_size=64, patch_size=16)
    assert out["grid"].shape == (2, 3, 49, 16, 16, 3)
    assert out["whole"].shape == (2, 3, 64, 64, 3)
    assert out["whole_unnorm"].shape == (2, 3, 64, 64, 3)
    np.testing.assert_allclose(
        np.asarray(out["whole"]),
        np.asarray(normalize(out["whole_unnorm"])), atol=1e-5)


def test_device_grid_cj_flip_actually_applied():
    """frame_aug 'grid-cj'/'grid-flip' must change the grid view vs plain
    'grid' under the same key (the per-patch ops were silently dropped
    before) while leaving whole/whole_unnorm untouched."""
    clip = jnp.asarray(np.random.RandomState(1)
                       .randint(0, 255, (1, 2, 96, 128, 3), np.uint8))
    key = jax.random.PRNGKey(3)
    base = train_transform_device(key, clip, img_size=64, patch_size=16,
                                  frame_aug="grid")
    for aug in ("grid-cj", "grid-flip", "grid-cj-flip"):
        out = train_transform_device(key, clip, img_size=64, patch_size=16,
                                     frame_aug=aug)
        assert not np.allclose(np.asarray(out["grid"]),
                               np.asarray(base["grid"])), aug
        np.testing.assert_array_equal(np.asarray(out["whole"]),
                                      np.asarray(base["whole"]))


def test_device_rrc_bounds_and_variety():
    imgs = jnp.asarray(np.random.RandomState(0)
                       .rand(8, 50, 70, 3).astype(np.float32))
    out = random_resized_crop(jax.random.PRNGKey(0), imgs, 32)
    assert out.shape == (8, 32, 32, 3)
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= -1e-3
    # different crops per image (not all identical)
    assert np.std([o[i].mean() for i in range(8)]) > 0


def test_device_color_jitter_range():
    imgs = jnp.asarray(np.random.RandomState(1)
                       .rand(4, 16, 16, 3).astype(np.float32))
    out = np.asarray(color_jitter(jax.random.PRNGKey(0), imgs))
    assert out.min() >= 0 and out.max() <= 1
    assert not np.allclose(out, np.asarray(imgs))


def test_device_hflip():
    imgs = jnp.asarray(np.arange(2 * 4 * 4 * 3, dtype=np.float32)
                       .reshape(2, 4, 4, 3))
    out = np.asarray(random_hflip(jax.random.PRNGKey(3), imgs, p=1.0))
    np.testing.assert_array_equal(out, np.asarray(imgs)[:, :, ::-1])


def test_extract_patch_grid_matches_strided_windows():
    imgs = jnp.asarray(np.random.RandomState(2)
                       .rand(1, 64, 64, 3).astype(np.float32))
    tiles = np.asarray(extract_patch_grid(imgs, 16, 8))
    assert tiles.shape == (1, 49, 16, 16, 3)
    src = np.asarray(imgs[0])
    np.testing.assert_array_equal(tiles[0, 0], src[:16, :16])
    np.testing.assert_array_equal(tiles[0, 8], src[8:24, 8:24])


def test_sk_targets_loss_and_grad():
    q = np.random.RandomState(0).randn(2, 16, 5, 9).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    loss, diags = sk_targets_walk_loss(jnp.asarray(q), 0.07)
    assert np.isfinite(float(loss))
    assert "xent sk 1" in diags and "acc sk 3" in diags
    g = jax.grad(lambda x: sk_targets_walk_loss(x, 0.07)[0])(jnp.asarray(q))
    assert bool(jnp.all(jnp.isfinite(g)))


# --------------------------------------------------------------- visualize


def test_pca_feats_shapes():
    ff = np.random.RandomState(0).randn(2, 16, 8, 8).astype(np.float32)
    out = pca_feats(ff)
    assert out.shape == (2, 3, 8, 8)
    assert out.min() >= 0 and out.max() <= 1


def test_make_grid():
    imgs = np.zeros((5, 3, 4, 4), np.float32)
    grid = make_grid(imgs, nrow=3)
    assert grid.shape == (3, 2 * 5 + 1, 3 * 5 + 1)


def test_compute_flow_identity():
    """Identity affinity -> zero flow."""
    hw = 16
    corr = np.eye(hw, dtype=np.float32)[None]
    u, v = compute_flow(corr)
    np.testing.assert_array_equal(u, 0)
    np.testing.assert_array_equal(v, 0)


def test_visualize_jsonl_logger(tmp_path):
    import types

    args = types.SimpleNamespace(name="t", logs_dir=str(tmp_path))
    vis = Visualize(args)
    vis.wandb_init()
    vis.log({"loss": 1.5})
    vis.log({"loss": 1.2, "acc": 0.3})
    path = os.path.join(str(tmp_path), "metrics.jsonl")
    assert os.path.exists(path)
    lines = open(path).read().strip().splitlines()
    assert len(lines) == 2

    img = np.random.rand(3, 8, 8).astype(np.float32)
    p = vis.save_image(img, "testimg")
    assert os.path.exists(p)


def test_vis_adj_saves_figure(tmp_path):
    import types

    from videowalk_tpu.utils.visualize import vis_adj

    args = types.SimpleNamespace(name="t", logs_dir=str(tmp_path))
    vis = Visualize(args)
    video = np.random.rand(2, 3, 16, 16).astype(np.float32)
    seg = np.random.randint(0, 4, (2, 16, 16))
    orig = np.random.rand(2, 3, 16, 16).astype(np.float32)
    As = [np.random.rand(4, 4)]
    path = vis_adj(video, seg, As, vis, orig)
    assert os.path.exists(path)


def test_vis_flow_plt_unstable_grid_sizes():
    """Float-step np.mgrid produced H+2 anchor rows for pairs like
    (Ih=256, H=48), crashing quiver — the linspace form is exact."""
    from videowalk_tpu.utils.visualize import vis_flow_plt

    rng = np.random.RandomState(0)
    for Ih, H in [(256, 48), (400, 28), (480, 25), (256, 16)]:
        u = rng.randint(-2, 3, (1, H, H))
        v = rng.randint(-2, 3, (1, H, H))
        x1 = rng.rand(3, Ih, Ih).astype(np.float32)
        A = rng.rand(H * H, H * H).astype(np.float32)
        fig = vis_flow_plt(u, v, x1, None, A)
        assert fig is not None
        import matplotlib.pyplot as plt

        plt.close(fig)


def test_make_gif_layout_and_dtype():
    """uint8 channel-first input must not take the *255 modulo-wrap, and
    out-of-range floats are clipped before the uint8 cast."""
    from videowalk_tpu.utils.visualize import make_gif

    rng = np.random.RandomState(1)
    u8 = rng.randint(0, 256, (3, 3, 16, 16), np.uint8)      # (N,3,H,W) uint8
    out = make_gif(u8, outname=None, sz=8)
    assert out.dtype == np.uint8 and out.shape == (3, 8, 8, 3)
    # a solid-200 frame must stay ~200, not wrap to 200*255 % 256
    solid = np.full((2, 3, 16, 16), 200, np.uint8)
    out = make_gif(solid, outname=None, sz=8)
    assert abs(int(out.mean()) - 200) <= 1
    # floats slightly out of [0,1] clip instead of wrapping
    f = np.full((2, 16, 16, 3), 1.02, np.float32)
    out = make_gif(f, outname=None, sz=8)
    assert out.min() == 255


def test_visualize_jsonl_non_numeric(tmp_path):
    """The JSONL fallback accepts non-numeric values like the wandb path
    does (string metadata used to crash it)."""
    import json as _json
    import types

    from videowalk_tpu.utils.visualize import Visualize

    vis = Visualize(types.SimpleNamespace(name="t", logs_dir=str(tmp_path)))
    vis.wandb_init()
    vis.log({"loss": 0.5, "phase": "train"})
    rec = _json.loads(
        open(tmp_path / "metrics.jsonl").read().splitlines()[-1])
    assert rec["loss"] == 0.5 and rec["phase"] == "train"
