"""Batched on-device SLIC superpixels (JAX/XLA, MXU-shaped).

The reference computes SLIC per frame with scikit-image inside CPU DataLoader
workers (code/data/superpixels.py:9-15, called from code/data/kinetics.py:119)
— the pipeline's known bottleneck (reference README.md:12,30). This module
moves segmentation onto the TPU, batched over (B, T):

- assignment: squared 5-D distance expanded as ``|f|^2 - 2 f.c + |c|^2`` so
  the cross term is one MXU matmul per iteration; the SLIC 2S-window
  constraint is a coordinate mask added as +inf;
- center update: segment means via a one-hot matmul (MXU again);
- fixed iteration count under ``lax.fori_loop`` (static shapes, one compile).

Differences vs. skimage SLIC (code/data/superpixels.py:14): no
enforce-connectivity post-pass (labels feed size-normalized pooling, where
disconnected slivers are harmless); grid initialization without perturbation
(same as skimage). Color space is CIELAB like skimage's convert2lab=True.
Compactness semantics match the SLIC paper / skimage: spatial distances are
scaled by ``compactness / S`` against unscaled LAB distances.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def rgb_to_lab(rgb: jax.Array) -> jax.Array:
    """sRGB in [0, 1] -> CIELAB (D65), matching skimage.color.rgb2lab.

    Args:
      rgb: ``(..., 3)`` floats in [0, 1].
    Returns:
      ``(..., 3)`` with L in [0, 100], a/b roughly [-128, 127].
    """
    rgb = jnp.clip(rgb, 0.0, 1.0)
    # inverse sRGB companding
    linear = jnp.where(rgb > 0.04045,
                       ((rgb + 0.055) / 1.055) ** 2.4,
                       rgb / 12.92)
    # sRGB -> XYZ (D65)
    m = jnp.asarray([[0.412453, 0.357580, 0.180423],
                     [0.212671, 0.715160, 0.072169],
                     [0.019334, 0.119193, 0.950227]], rgb.dtype)
    xyz = linear @ m.T
    # normalize by D65 white point
    white = jnp.asarray([0.95047, 1.0, 1.08883], rgb.dtype)
    xyz = xyz / white
    eps, kappa = 0.008856, 7.787
    f = jnp.where(xyz > eps, jnp.cbrt(xyz), kappa * xyz + 16.0 / 116.0)
    L = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return jnp.stack([L, a, b], axis=-1)


def _grid_centers(H: int, W: int, n_segments: int) -> tuple:
    """Regular-grid initial centers (y, x), like skimage's mgrid slices."""
    import numpy as np

    gh = int(np.sqrt(n_segments * H / W) + 0.5)
    gw = int(np.ceil(n_segments / max(1, gh)))
    gh = max(1, gh)
    ys = (np.arange(gh) + 0.5) * H / gh
    xs = (np.arange(gw) + 0.5) * W / gw
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    yy, xx = yy.ravel()[:n_segments], xx.ravel()[:n_segments]
    # If the grid came up short (gh*gw < n), tile the remainder randomly
    # deterministic: repeat from the start.
    if yy.size < n_segments:
        reps = int(np.ceil(n_segments / yy.size))
        yy = np.tile(yy, reps)[:n_segments]
        xx = np.tile(xx, reps)[:n_segments]
    return (jnp.asarray(yy, jnp.float32), jnp.asarray(xx, jnp.float32))


@partial(jax.jit, static_argnames=("n_segments", "compactness", "n_iter",
                                   "convert_lab"))
def slic(
    images: jax.Array,
    n_segments: int = 36,
    compactness: float = 50.0,
    n_iter: int = 10,
    convert_lab: bool = True,
    n_active: jax.Array | None = None,
) -> jax.Array:
    """Batched SLIC segmentation on device.

    Args:
      images: ``(..., H, W, 3)`` floats in [0, 1] (any leading batch dims).
      n_segments: number of superpixel centers (reference --num-sp).
      compactness: SLIC compactness (reference --compactness).
      n_iter: k-means iterations (skimage default 10).
      n_active: optional per-image active center counts (shape = leading
        dims, values in [1, n_segments]) — the static-shape equivalent of the
        reference's per-frame randomized segment counts
        (--randomise-superpixels, code/data/superpixels.py:35-48): centers
        with index >= n_active are masked out of assignment.

    Returns:
      ``(..., H, W)`` int32 dense labels in [0, n_segments).
    """
    lead = images.shape[:-3]
    H, W = images.shape[-3], images.shape[-2]
    x = images.reshape(-1, H, W, 3)
    B = x.shape[0]
    active_mask = None
    if n_active is not None:
        n_active = jnp.asarray(n_active).reshape(B)
        active_mask = (jnp.arange(n_segments)[None, :]
                       >= n_active[:, None])  # (B, K) True = disabled

    color = rgb_to_lab(x) if convert_lab else x * 100.0
    feats = color.reshape(B, H * W, 3)

    # pixel coordinates
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    py = jnp.broadcast_to(yy, (H, W)).reshape(-1)
    px = jnp.broadcast_to(xx, (H, W)).reshape(-1)

    S = (H * W / n_segments) ** 0.5
    ratio = compactness / S  # spatial scale (SLIC paper / skimage)
    coords = jnp.stack([py * ratio, px * ratio], axis=-1)     # (HW, 2)
    f5 = jnp.concatenate([feats, jnp.broadcast_to(coords, (B, H * W, 2))],
                         axis=-1)                              # (B, HW, 5)

    cy0, cx0 = _grid_centers(H, W, n_segments)
    # initial centers: sample color at the grid point
    ci = (jnp.clip(cy0.astype(jnp.int32), 0, H - 1) * W
          + jnp.clip(cx0.astype(jnp.int32), 0, W - 1))
    c_color0 = feats[:, ci, :]                                 # (B, K, 3)
    c_pos0 = jnp.stack([cy0 * ratio, cx0 * ratio], axis=-1)    # (K, 2)
    centers0 = jnp.concatenate(
        [c_color0, jnp.broadcast_to(c_pos0, (B, n_segments, 2))], axis=-1)

    f_sqnorm = jnp.sum(f5 * f5, axis=-1, keepdims=True)        # (B, HW, 1)
    window = 2.0 * S * ratio  # 2S in scaled coordinates

    def assign(centers):
        # (B, HW, K) squared distances via MXU cross-term
        cross = jnp.einsum("bnf,bkf->bnk", f5, centers,
                           preferred_element_type=jnp.float32)
        c_sq = jnp.sum(centers * centers, axis=-1)[:, None, :]
        d = f_sqnorm - 2.0 * cross + c_sq
        # SLIC window: only centers within 2S (per axis)
        # centers columns: [L, a, b, y*ratio, x*ratio]
        dy = jnp.abs(coords[None, :, 0:1] - centers[:, None, :, 3])
        dx = jnp.abs(coords[None, :, 1:2] - centers[:, None, :, 4])
        d = jnp.where((dy > window) | (dx > window), jnp.inf, d)
        if active_mask is not None:
            d = jnp.where(active_mask[:, None, :], jnp.inf, d)
        # Pixels with no in-window center (possible with few active centers)
        # fall back to unmasked nearest-center assignment.
        no_valid = jnp.all(jnp.isinf(d), axis=-1, keepdims=True)
        d_unwindowed = f_sqnorm - 2.0 * cross + c_sq
        if active_mask is not None:
            d_unwindowed = jnp.where(active_mask[:, None, :], jnp.inf,
                                     d_unwindowed)
        d = jnp.where(no_valid, d_unwindowed, d)
        return jnp.argmin(d, axis=-1)                           # (B, HW)

    def update(labels):
        onehot = jax.nn.one_hot(labels, n_segments, dtype=jnp.float32)
        sums = jnp.einsum("bnk,bnf->bkf", onehot, f5,
                          preferred_element_type=jnp.float32)
        counts = jnp.sum(onehot, axis=1)[..., None]
        return sums / jnp.maximum(counts, 1.0), counts[..., 0]

    def body(_, carry):
        centers, _ = carry
        labels = assign(centers)
        new_centers, counts = update(labels)
        # keep empty clusters where they were (avoid NaN drift)
        new_centers = jnp.where(counts[..., None] > 0, new_centers, centers)
        return new_centers, labels

    # labels init is dead for n_iter >= 1 (body recomputes assign(centers)
    # before reading it) — zeros avoid a wasted full assignment pass
    centers, labels = jax.lax.fori_loop(
        0, n_iter, body, (centers0, jnp.zeros((B, H * W), jnp.int32)))
    return labels.reshape(*lead, H, W).astype(jnp.int32)
