"""Reflect padding with a scatter-free custom VJP.

The reference encoder uses reflect-padded convs ('scratch' model type,
code/resnet.py:30-36). XLA differentiates ``jnp.pad(mode='reflect')`` into a
generic scatter-add, which costs ~1/3 of the whole CRW train step on TPU
(measured: 143 ms/step reflect vs 95 ms zero-pad at the bench config). The
VJP is actually just three static slices + two static pads per axis:

  y = concat(flip(x[:, 1:p+1]), x, flip(x[:, H-p-1:H-1]))   (axis pad p)
  dx = dy_core ; dx[1:p+1] += flip(dy_top) ; dx[H-p-1:H-1] += flip(dy_bot)

expressed below with pads instead of index-adds, so the backward is pure
dense adds that XLA fuses.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def reflect_pad_hw(x: jax.Array, pad_h: int, pad_w: int) -> jax.Array:
    """Reflect-pad axes 1 and 2 of an NHWC tensor."""
    return jnp.pad(x, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)),
                   mode="reflect")


def _fwd(x, pad_h, pad_w):
    return reflect_pad_hw(x, pad_h, pad_w), None


def _axis_bwd(dy: jax.Array, p: int, axis: int) -> jax.Array:
    """VJP of reflect pad along one axis, scatter-free."""
    if p == 0:
        return dy
    n = dy.shape[axis] - 2 * p

    def slc(start, size):
        idx = [slice(None)] * dy.ndim
        idx[axis] = slice(start, start + size)
        return dy[tuple(idx)]

    core = slc(p, n)
    top = jnp.flip(slc(0, p), axis)          # maps to x[1 : p+1]
    bot = jnp.flip(slc(p + n, p), axis)      # maps to x[n-p-1 : n-1]
    pad_top = [(0, 0)] * dy.ndim
    pad_top[axis] = (1, n - p - 1)
    pad_bot = [(0, 0)] * dy.ndim
    pad_bot[axis] = (n - p - 1, 1)
    return core + jnp.pad(top, pad_top) + jnp.pad(bot, pad_bot)


def _bwd(pad_h, pad_w, _res, dy):
    # forward pads H then W (equivalent to simultaneous reflect);
    # backward undoes W then H.
    dx = _axis_bwd(dy, pad_w, 2)
    dx = _axis_bwd(dx, pad_h, 1)
    return (dx,)


reflect_pad_hw.defvjp(_fwd, _bwd)
