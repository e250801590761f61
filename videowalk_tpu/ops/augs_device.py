"""Batched on-device augmentation (TPU equivalent of kornia_augs).

The reference ships a GPU-side augmentation module (code/utils/kornia_augs.py)
that was never wired in because it ran slower than CPU workers on their DGX
(:14-17). On TPU the calculus flips: this host has few cores and the chip is
idle during augmentation, so the whole 3-view transform triple
(code/utils/augs.py:139-170 semantics) runs on device here, batched over
(B, T) and jitted:

- ``random_resized_crop``: per-frame crop boxes sampled from the same
  scale/log-ratio distribution as torchvision, applied with
  ``jax.image.scale_and_translate`` (bilinear);
- ``color_jitter``: brightness/contrast/saturation factors per frame,
  applied in a per-frame random order (lax.switch over the 6 permutations);
- ``random_hflip``; ``normalize`` (CIFAR-style stats, augs.py:10-11);
- ``patch_grid``: the 7x7/64px/stride-32 grid with per-patch spatial jitter
  (augs.py:59-82) — windows gathered with XLA patch extraction, jitter as a
  second batched crop.

Randomness is jax.random-keyed; distributions match the host pipeline
(videowalk_tpu/data/augs.py), not bitwise (different RNG streams).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from videowalk_tpu.data.augs import IMG_MEAN, IMG_STD


def normalize(img: jax.Array) -> jax.Array:
    return ((img - jnp.asarray(IMG_MEAN, img.dtype))
            / jnp.asarray(IMG_STD, img.dtype))


def _sample_crop_boxes(key, B: int, h: int, w: int, scale, ratio):
    """Vectorized torchvision get_params: sample 10 candidate boxes per
    image from the area/log-ratio distribution, take the first in-bounds
    one, else center crop. Returns (i, j, ch, cw) each (B,)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = h * w
    target_area = area * jax.random.uniform(
        k1, (B, 10), minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(
        k2, (B, 10), minval=math.log(ratio[0]), maxval=math.log(ratio[1]))
    aspect = jnp.exp(log_ratio)
    cw = jnp.round(jnp.sqrt(target_area * aspect)).astype(jnp.int32)
    ch = jnp.round(jnp.sqrt(target_area / aspect)).astype(jnp.int32)
    ok = (cw > 0) & (cw <= w) & (ch > 0) & (ch <= h)
    # first valid candidate (argmax over bool picks first True); fallback =
    # torchvision's ratio-clamped center crop (host parity, data/augs.py:
    # 80-88), not the full frame — h/w/ratio are static so it's plain math
    in_ratio = w / h
    if in_ratio < min(ratio):
        fb_w, fb_h = w, int(round(w / min(ratio)))
    elif in_ratio > max(ratio):
        fb_w, fb_h = int(round(h * max(ratio))), h
    else:
        fb_w, fb_h = w, h
    first = jnp.argmax(ok, axis=1)
    any_ok = jnp.any(ok, axis=1)
    cw = jnp.where(any_ok, cw[jnp.arange(B), first], fb_w)
    ch = jnp.where(any_ok, ch[jnp.arange(B), first], fb_h)
    # uniform position; the fallback is CENTERED like torchvision's
    i = (jax.random.uniform(k3, (B,)) * (h - ch + 1)).astype(jnp.int32)
    j = (jax.random.uniform(k4, (B,)) * (w - cw + 1)).astype(jnp.int32)
    i = jnp.where(any_ok, i, (h - ch) // 2)
    j = jnp.where(any_ok, j, (w - cw) // 2)
    return i, j, ch, cw


def _crop_resize_one(img, i, j, ch, cw, out_size: int):
    """Bilinear crop-and-resize of one (h, w, 3) image to (out, out, 3)."""
    scale = jnp.stack([out_size / ch.astype(jnp.float32),
                       out_size / cw.astype(jnp.float32)])
    translation = -jnp.stack([i.astype(jnp.float32) * scale[0],
                              j.astype(jnp.float32) * scale[1]])
    # antialias=False: the host operator is crop + cv2.INTER_LINEAR, which
    # has no low-pass — antialias=True would widen the bilinear kernel on
    # downscale and systematically soften device-augmented frames vs host
    return jax.image.scale_and_translate(
        img, (out_size, out_size, 3), (0, 1), scale, translation,
        method="linear", antialias=False)


def random_resized_crop(key, imgs: jax.Array, out_size: int,
                        scale=(0.8, 0.95), ratio=(0.7, 1.3)) -> jax.Array:
    """Per-image RandomResizedCrop, batched: imgs (B, h, w, 3) -> (B, s, s, 3)."""
    B, h, w = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    i, j, ch, cw = _sample_crop_boxes(key, B, h, w, scale, ratio)
    return jax.vmap(_crop_resize_one, in_axes=(0, 0, 0, 0, 0, None))(
        imgs, i, j, ch, cw, out_size)


_PERMS = [(0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0)]


def color_jitter(key, imgs: jax.Array, brightness=0.1, contrast=0.1,
                 saturation=0.1) -> jax.Array:
    """Per-image ColorJitter with random op order (torchvision semantics)."""
    B = imgs.shape[0]
    kb, kc, ks, ko = jax.random.split(key, 4)
    fb = jax.random.uniform(kb, (B,), minval=max(0, 1 - brightness),
                            maxval=1 + brightness)
    fc = jax.random.uniform(kc, (B,), minval=max(0, 1 - contrast),
                            maxval=1 + contrast)
    fs = jax.random.uniform(ks, (B,), minval=max(0, 1 - saturation),
                            maxval=1 + saturation)
    order = jax.random.randint(ko, (B,), 0, len(_PERMS))

    def apply_one(img, f_b, f_c, f_s, perm_idx):
        def bright(x):
            return jnp.clip(x * f_b, 0, 1)

        def contr(x):
            m = jnp.mean(x.mean(-1))
            return jnp.clip(m + f_c * (x - m), 0, 1)

        def satur(x):
            g = (0.299 * x[..., 0] + 0.587 * x[..., 1]
                 + 0.114 * x[..., 2])[..., None]
            return jnp.clip(g + f_s * (x - g), 0, 1)

        ops = [bright, contr, satur]
        branches = [
            (lambda x, p=perm: ops[p[2]](ops[p[1]](ops[p[0]](x))))
            for perm in _PERMS
        ]
        return jax.lax.switch(perm_idx, branches, img)

    return jax.vmap(apply_one)(imgs, fb, fc, fs, order)


def random_hflip(key, imgs: jax.Array, p: float = 0.5) -> jax.Array:
    flip = jax.random.uniform(key, (imgs.shape[0],)) < p
    return jnp.where(flip[:, None, None, None], imgs[:, :, ::-1], imgs)


def extract_patch_grid(frames: jax.Array, patch: int, stride: int
                       ) -> jax.Array:
    """(B, S, S, 3) -> (B, N, patch, patch, 3) overlapping windows."""
    B, S = frames.shape[0], frames.shape[1]
    n = (S - patch) // stride + 1
    idx = jnp.arange(n) * stride
    rows = jax.vmap(
        lambda i: jax.lax.dynamic_slice_in_dim(frames, i, patch, axis=1),
        out_axes=1)(idx)                       # (B, n, patch, S, 3)
    tiles = jax.vmap(
        lambda j: jax.lax.dynamic_slice_in_dim(rows, j, patch, axis=3),
        out_axes=2)(idx)                       # (B, n, n, patch, patch, 3)
    return tiles.reshape(B, n * n, patch, patch, 3)


@partial(jax.jit, static_argnames=("img_size", "patch_size", "frame_aug",
                                   "frame_transforms"))
def train_transform_device(
    key: jax.Array,
    clip: jax.Array,
    img_size: int = 256,
    patch_size: int = 64,
    frame_aug: str = "grid",
    frame_transforms: str = "crop",
) -> dict[str, jax.Array]:
    """Full 3-view transform triple on device.

    Args:
      clip: ``(B, T, H, W, 3)`` uint8 or float frames.
    Returns:
      dict(grid, whole, whole_unnorm) with the host pipeline's shapes
      (videowalk_tpu/data/augs.py TrainTransform).
    """
    B, T = clip.shape[0], clip.shape[1]
    x = clip.reshape(B * T, *clip.shape[2:]).astype(jnp.float32)
    if clip.dtype == jnp.uint8:
        x = x / 255.0

    k_crop, k_cj, k_flip, k_grid = jax.random.split(key, 4)
    if "crop" in frame_transforms:
        x = random_resized_crop(k_crop, x, img_size)
    else:
        x = jax.image.resize(x, (B * T, img_size, img_size, 3), "linear")
    if "cj" in frame_transforms:
        x = color_jitter(k_cj, x)
    if "flip" in frame_transforms:
        x = random_hflip(k_flip, x)

    whole_unnorm = x.reshape(B, T, img_size, img_size, 3)
    whole = normalize(whole_unnorm)

    if "grid" in frame_aug:
        stride = patch_size // 2  # reference's degenerate [.5,.5] range
        patches = extract_patch_grid(x, patch_size, stride)  # (BT, N, p, p, 3)
        N = patches.shape[1]
        flat = patches.reshape(B * T * N, patch_size, patch_size, 3)
        k_grid, k_pcj, k_pflip = jax.random.split(k_grid, 3)
        flat = random_resized_crop(k_grid, flat, patch_size,
                                   scale=(0.7, 0.9), ratio=(1.0, 1.0))
        # per-patch cj/flip for 'grid-cj'/'grid-flip' (host parity:
        # data/augs.py applies them per patch after the jitter crop)
        if "cj" in frame_aug:
            flat = color_jitter(k_pcj, flat)
        if "flip" in frame_aug:
            flat = random_hflip(k_pflip, flat)
        grid = normalize(flat.reshape(B, T, N, patch_size, patch_size, 3))
    else:
        grid = whole
    return {"grid": grid, "whole": whole, "whole_unnorm": whole_unnorm}
