"""Pallas TPU kernel: fully-fused SLIC segmentation (one program per frame).

The XLA device SLIC (ops/slic_device.py) materializes ``(B, HW, K)`` distance
tensors in HBM every iteration, and a naive per-tile kernel drowns in
per-program overhead. This kernel runs the ENTIRE segmentation of one frame
inside one Pallas program: pixel features load into VMEM once, all
``n_iter`` k-means iterations run from VMEM (distances chunk-by-chunk in
scratch, centers carried through a ``fori_loop``), and only the final labels
leave the chip.

Tricks:
- pixel features are padded to 8 columns ``[L, a, b, y*r, x*r, 1, 0, 0]``;
  accumulating ``onehot^T @ f8`` gives center sums AND member counts
  (column 5) in one MXU matmul;
- disabled/empty center slots are parked at coordinate -1e9: they can never
  win an assignment, get zero counts, and therefore stay parked — no
  explicit masking inside the kernel (this also implements the reference's
  randomized per-frame segment counts, --randomise-superpixels, via
  ``n_active``).

API: ``slic_fused(images, ...)`` matches ``ops.slic_device.slic`` and is
validated against it (tests/test_slic_kernel.py).

STATUS — experimental, not the default: measured on v5e (single TensorCore),
the one-program-per-frame design serializes frames (~19 ms/frame) while the
XLA path amortizes fixed costs across the whole batch (~6 ms/frame at
batch 32). The VMEM-resident iteration loop only wins on multi-core chips or
once the chunk loop is double-buffered and the VPU masking work is folded
into the distance matmul. ``ops.slic_device.slic`` remains the production
path; this kernel is kept as the starting point for that work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videowalk_tpu.ops.slic_device import _grid_centers, rgb_to_lab

K_PAD = 128   # center slots padded to one lane tile
F_PAD = 8     # feature columns padded to one sublane tile
BIG = 1e30


def _assign_chunk(f8c, centers, window):
    """Distances + windowed argmin for one pixel chunk.

    Returns (labels (chunk, 1) int32, onehot (chunk, K) f32).
    """
    chunk = f8c.shape[0]
    f_sq = jnp.sum(f8c[:, :5] * f8c[:, :5], axis=-1, keepdims=True)
    c_sq = jnp.sum(centers[:, :5] * centers[:, :5], axis=-1,
                   keepdims=True).T                     # (1, K)
    cross = jax.lax.dot_general(
        f8c[:, :5], centers[:, :5],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # (chunk, K)
    d = f_sq - 2.0 * cross + c_sq

    dy = jnp.abs(f8c[:, 3:4] - centers[:, 3:4].T)
    dx = jnp.abs(f8c[:, 4:5] - centers[:, 4:5].T)
    d_masked = jnp.where((dy > window) | (dx > window), BIG, d)

    lanes = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    no_valid = jnp.min(d_masked, axis=-1, keepdims=True) >= BIG
    d_eff = jnp.where(no_valid, d, d_masked)
    m = jnp.min(d_eff, axis=-1, keepdims=True)
    labels = jnp.min(jnp.where(d_eff == m, lanes, K_PAD), axis=-1,
                     keepdims=True)                     # (chunk, 1)
    onehot = (labels
              == jax.lax.broadcasted_iota(jnp.int32, (chunk, K_PAD), 1)
              ).astype(jnp.float32)
    return labels, onehot


def _slic_frame_kernel(f8_ref, centers0_ref, labels_ref,
                       *, n_iter: int, window: float, chunk: int):
    """One frame end-to-end: f8 (HW, 8) + initial centers -> labels."""
    HW = f8_ref.shape[0]
    n_chunks = HW // chunk

    def one_iter(_, centers):
        def chunk_body(c, sums):
            f8c = f8_ref[pl.ds(c * chunk, chunk), :]
            _, onehot = _assign_chunk(f8c, centers, window)
            return sums + jax.lax.dot_general(
                onehot, f8c, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # (K, 8)

        sums = jax.lax.fori_loop(
            0, n_chunks, chunk_body, jnp.zeros((K_PAD, F_PAD), jnp.float32))
        counts = sums[:, 5:6]
        new_c = sums / jnp.maximum(counts, 1.0)
        # zero columns 5..7 (the count/pad columns must stay 0 on centers)
        col = jax.lax.broadcasted_iota(jnp.int32, new_c.shape, 1)
        new_c = jnp.where(col < 5, new_c, 0.0)
        return jnp.where(counts > 0, new_c, centers)

    centers = jax.lax.fori_loop(0, n_iter, one_iter, centers0_ref[...])

    def write_chunk(c, _):
        f8c = f8_ref[pl.ds(c * chunk, chunk), :]
        labels, _ = _assign_chunk(f8c, centers, window)
        labels_ref[pl.ds(c * (chunk // 128), chunk // 128), :] = (
            labels.reshape(chunk // 128, 128))
        return 0

    jax.lax.fori_loop(0, n_chunks, write_chunk, 0)


@functools.partial(jax.jit, static_argnames=("n_segments", "compactness",
                                             "n_iter", "convert_lab"))
def slic_fused(
    images: jax.Array,
    n_segments: int = 36,
    compactness: float = 50.0,
    n_iter: int = 10,
    convert_lab: bool = True,
    n_active: jax.Array | None = None,
) -> jax.Array:
    """Fused-kernel SLIC; same contract as ``ops.slic_device.slic``."""
    interpret = jax.default_backend() != "tpu"
    lead = images.shape[:-3]
    H, W = images.shape[-3], images.shape[-2]
    x = images.reshape(-1, H, W, 3)
    B, HW = x.shape[0], H * W

    color = rgb_to_lab(x) if convert_lab else x * 100.0
    feats = color.reshape(B, HW, 3)

    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    S = (HW / n_segments) ** 0.5
    ratio = compactness / S
    window = 2.0 * S * ratio
    coords = jnp.stack([jnp.broadcast_to(yy, (H, W)).reshape(-1) * ratio,
                        jnp.broadcast_to(xx, (H, W)).reshape(-1) * ratio],
                       axis=-1)
    ones = jnp.ones((B, HW, 1), jnp.float32)
    zeros = jnp.zeros((B, HW, 2), jnp.float32)
    f8 = jnp.concatenate(
        [feats, jnp.broadcast_to(coords, (B, HW, 2)), ones, zeros], axis=-1)

    # initial centers on the grid; unused/disabled slots parked at -1e9
    cy0, cx0 = _grid_centers(H, W, n_segments)
    ci = (jnp.clip(cy0.astype(jnp.int32), 0, H - 1) * W
          + jnp.clip(cx0.astype(jnp.int32), 0, W - 1))
    c_color0 = feats[:, ci, :]
    c_pos0 = jnp.broadcast_to(jnp.stack([cy0 * ratio, cx0 * ratio], -1),
                              (B, n_segments, 2))
    centers = jnp.concatenate(
        [c_color0, c_pos0, jnp.zeros((B, n_segments, 3), jnp.float32)],
        axis=-1)
    pad = jnp.full((B, K_PAD - n_segments, F_PAD), -1e9, jnp.float32)
    centers = jnp.concatenate([centers, pad], axis=1)
    if n_active is not None:
        n_active = jnp.asarray(n_active).reshape(B)
        disabled = (jnp.arange(K_PAD)[None, :] >= n_active[:, None])
        centers = jnp.where(disabled[..., None], -1e9, centers)

    chunk = 2048
    while HW % chunk:
        chunk //= 2

    kern = functools.partial(_slic_frame_kernel, n_iter=n_iter,
                             window=window, chunk=chunk)
    labels = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, HW, F_PAD), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, K_PAD, F_PAD), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, HW // 128, 128), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HW // 128, 128), jnp.int32),
        interpret=interpret,
    )(f8, centers)
    return labels.reshape(*lead, H, W).astype(jnp.int32)
