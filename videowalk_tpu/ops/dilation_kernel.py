"""Pallas TPU kernel: L1 (diamond) morphological dilation, fully in VMEM.

The XLA decomposition of the k=55 L1 dilation (models/crw.py dilate_onehot:
two diagonal segment max-filters in O(log r) shifted maxes + a unit-diamond
parity fill) is exact but HBM-bound: every shifted max materializes a
pad+slice copy of the whole (B*T*S, 256, 256) one-hot stack, ~17 passes =
tens of GB of traffic — measured 22.6 ms of the 50.5 ms dilated-superpixel
train step (train.sh config). Here one channel block is DMA'd to VMEM once,
ALL shift+max passes run on-chip, and the result is written back once: HBM
traffic drops to one read + one write of the stack.

Gradient: none — and that matches the reference exactly. The reference
dilates with a grouped conv THEN thresholds ``(out > 0)``
(code/model.py:303-309), whose derivative is zero almost everywhere; the
caller applies ``stop_gradient`` accordingly (the dilated mask is built from
integer SLIC labels, so no gradient path exists in the model anyway).

Shift semantics match dilate_onehot's ``shift`` (zero fill outside the
frame) via in-VMEM concat-with-zeros; the input arrives pre-padded by r so
diagonal paths through off-frame cells keep their coverage (see the
zero-pad note in models/crw.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift(y, dy, dx):
    """out[h, w] = in[h - dy, w - dx], zero outside — (CB, H, W) block."""
    _, H, W = y.shape
    if dy > 0:
        y = jnp.concatenate(
            [jnp.zeros_like(y[:, :dy]), y[:, :H - dy]], axis=1)
    elif dy < 0:
        y = jnp.concatenate(
            [y[:, -dy:], jnp.zeros_like(y[:, :-dy])], axis=1)
    if dx > 0:
        y = jnp.concatenate(
            [jnp.zeros_like(y[:, :, :dx]), y[:, :, :W - dx]], axis=2)
    elif dx < 0:
        y = jnp.concatenate(
            [y[:, :, -dx:], jnp.zeros_like(y[:, :, :-dx])], axis=2)
    return y


def _segment_dilate(y, a, sy, sx):
    """Max over t in [-a, a] of shift by t*(sy, sx) — doubling trick."""
    n = 2 * a + 1
    covered = 1
    while covered * 2 <= n:
        y = jnp.maximum(y, _shift(y, covered * sy, covered * sx))
        covered *= 2
    if covered < n:
        d = n - covered
        y = jnp.maximum(y, _shift(y, d * sy, d * sx))
    return _shift(y, -a * sy, -a * sx)


def _unit_diamond(y):
    return jnp.maximum(
        jnp.maximum(jnp.maximum(_shift(y, 1, 0), _shift(y, -1, 0)),
                    jnp.maximum(_shift(y, 0, 1), _shift(y, 0, -1))), y)


def _dilate_kernel(x_ref, o_ref, *, a, units, r, h, w):
    y = x_ref[...]
    if a > 0:
        y = _segment_dilate(y, a, 1, 1)
        y = _segment_dilate(y, a, 1, -1)
    for _ in range(units):
        y = _unit_diamond(y)
    o_ref[...] = y[:, r:r + h, r:r + w]


@functools.partial(jax.jit, static_argnames=("kernel_size", "interpret"))
def dilate_l1_pallas(x: jax.Array, kernel_size: int,
                     interpret: bool = False) -> jax.Array:
    """L1-ball dilation of ``(N, h, w)`` 0/1 masks (radius = size // 2).

    Same decomposition as models/crw.py dilate_onehot's L1 branch, executed
    per channel block entirely in VMEM. No gradient (see module docstring).
    """
    from videowalk_tpu.core.masks import l1_decomposition

    N, h, w = x.shape
    r = kernel_size // 2
    a, units = l1_decomposition(r)
    if r < 1:
        return x
    # bf16 is exact for 0/1 masks and halves VMEM; cb=4 keeps the shift
    # temporaries under the 16 MB scoped-VMEM limit at 256^2 + r=27 halos.
    cb = 4
    pad_n = (-N) % cb
    xp = jnp.pad(x.astype(jnp.bfloat16),
                 ((0, pad_n), (r, r), (r, r)))
    Np, Hp, Wp = xp.shape

    out = pl.pallas_call(
        functools.partial(_dilate_kernel, a=a, units=units, r=r, h=h, w=w),
        grid=(Np // cb,),
        in_specs=[pl.BlockSpec((cb, Hp, Wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((cb, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, h, w), jnp.bfloat16),
        interpret=interpret,
    )(xp)
    return out[:N].astype(x.dtype)
