"""Spatial masks: label-propagation radius mask and superpixel dilation kernels.

Reference:
- radius mask  <-> code/utils/__init__.py:354-411 (MaskedAttention.make) —
  pairwise grid distance < radius, used at test time to restrict label-prop
  affinities (code/test.py:118-123).
- dilation kernel <-> code/utils/__init__.py:590-608 (make_dilation_kernel) —
  odd-size binary 2D kernel (L1 diamond / cross / circle), applied as a
  grouped conv over one-hot superpixel masks (code/model.py:303-309).

TPU design: both are precomputed constants under jit; the radius mask is built
once per (H, W) at trace time (no dict cache needed — XLA constant-folds it).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def radius_mask(H: int, W: int, radius: float) -> jnp.ndarray:
    """Binary locality mask over a HxW grid: 1 where dist(p, q) < radius.

    Returns ``(H, W, H, W)`` float32 — mask[i, j, k, l] = 1 iff the Euclidean
    distance between grid cells (i, j) and (k, l) is < radius. Flatten the
    last/first two axes for an (HW, HW) attention mask.

    Reference: code/utils/__init__.py:377-391 (flat=False branch).
    """
    gx, gy = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    dist = np.sqrt(
        (gx[None, None, :, :] - gx[:, :, None, None]) ** 2
        + (gy[None, None, :, :] - gy[:, :, None, None]) ** 2
    )
    return jnp.asarray((dist < radius).astype(np.float32))


def l1_decomposition(r: int) -> tuple[int, int]:
    """Split an L1 (diamond) dilation of radius ``r`` into two diagonal
    segment dilations of half-length ``a`` plus ``units`` unit-diamond
    passes: odd r = diag(a=(r-1)/2) + 1 diamond, even r = diag(r/2-1) + 2.
    Single authority for both executors (models/crw.py dilate_onehot's XLA
    path and ops/dilation_kernel.py's in-VMEM Pallas kernel) — each is
    independently oracle-pinned, but the radius math must never drift."""
    return ((r - 1) // 2, 1) if r % 2 else (r // 2 - 1, 2)


def make_dilation_kernel(kernel_size: int, kernel_shape: str = "L1") -> jnp.ndarray:
    """Odd-size binary 2D structuring element for superpixel dilation.

    Shapes: 'L1' (diamond: |di|+|dj| <= half), 'cross' (center row+col),
    'circle' (di^2 + dj^2 <= half^2).

    Reference: code/utils/__init__.py:590-608; flags
    code/utils/arguments.py:208-210.
    """
    assert kernel_size % 2 != 0, "Use an odd kernel size"
    c = kernel_size // 2
    ii, jj = np.meshgrid(np.arange(kernel_size), np.arange(kernel_size),
                         indexing="ij")
    if kernel_shape == "L1":
        k = (np.abs(c - ii) + np.abs(c - jj)) <= c
    elif kernel_shape == "cross":
        k = (ii == c) | (jj == c)
    elif kernel_shape == "circle":
        k = ((c - ii) ** 2 + (c - jj) ** 2) <= c**2
    else:
        raise ValueError(f"unknown dilation kernel shape: {kernel_shape!r}")
    return jnp.asarray(k.astype(np.float32))
