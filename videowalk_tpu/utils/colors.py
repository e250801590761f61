"""Shared color packing for the palette/label fast paths.

Several eval host-path hot spots (label-set building, one-hot construction,
palette index lookup) compare RGB uint8 triples by packing each into one
uint32 — one vectorized pass instead of per-channel compares + an ``np.all``
reduction. The byte order here (channel 0 most significant) is the single
source of truth: it makes packed order == lexicographic row order, so
``np.unique`` on packed values reproduces row-wise ``np.unique(..., axis=0)``
ordering exactly.
"""

from __future__ import annotations

import numpy as np


def pack_rgb(rgb: np.ndarray) -> np.ndarray:
    """(..., 3) uint8 -> (...) uint32, channel 0 most significant."""
    r = rgb.astype(np.uint32)
    return r[..., 0] << 16 | r[..., 1] << 8 | r[..., 2]
