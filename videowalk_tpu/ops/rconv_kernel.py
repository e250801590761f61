"""Pallas TPU kernel: 3x3 stride-1 reflect-padded convolution (+ hand VJP).

Why this exists (measured on v5e, see STATUS.md round-2 item 6): XLA:TPU runs
a conv FAST only when its padding goes through the conv op's own padding arg.
Reflect padding can't be expressed there, so the reference's 'scratch'
encoder (reflect on every spatial conv, /root/reference/code/resnet.py:30-36)
paid a materialized pad copy + off-tile VALID-conv shapes on every one of its
15 interior 3x3 convs, fwd and bwd — the whole measured reflect-vs-zeros gap
(130 vs ~95 ms on the flagship bench step). The round-2 zero-SAME +
boundary-strip rewrite was exact but neutral: 4 extra strip convs per layer
re-spent the savings on per-op glue.

Here the reflect indexing happens where it is free: the input tile is DMA'd
to VMEM once, the reflected (H+2, W+2) frame is built by two in-VMEM concats,
and the conv runs as 9 shifted (nb*H*W, Cin) @ (Cin, Cout) MXU matmuls
accumulated into an f32 VMEM scratch — no HBM pad copy, no off-tile conv
shapes, one read and one write of the activation per conv. The backward pass
is two more kernels of the same shape family:

- dx: full-correlation of the zero-embedded cotangent with the flipped
  kernel -> gradient on the PADDED frame, whose ring is folded back onto its
  reflected sources in-VMEM (the scatter-free reflect-pad VJP, fused; the
  fold is assembled row/column-wise to keep VMEM peak at one f32 map).
- dW: per-tap (Cin, M) @ (M, Cout) accumulated across batch tiles through a
  revisited f32 output block, tiled over Cout when the 9xCinxCout f32
  accumulator alone would crowd VMEM.

VMEM discipline (the first cut OOM'd the 16 MB scoped limit): batch tiles
are sized by a closed-form estimate that counts the reflected frame, one tap
slice + its 2-D relayout, the f32 accumulator, and pallas's double-buffered
in/out blocks, against an 11 MB budget after the resident weight buffer.

Scope: kernel 3x3, stride 1, pad 1 (reflect), 6 <= H, W <= 32 — i.e. every
interior conv of the modified ResNet (layer1 16x16 through layer3/4 8x8 at
the bench regime). The stem (7x7/2) and the one stride-2 conv keep the
materialized-pad fallback; 1x1 convs have no padding at all.

Exactness is pinned by tests/test_rconv_kernel.py against reflect-pad+VALID:
forward, input gradient, and kernel gradient.

Measured v5e flagship step (2026-08-17, fetch-synced difference quotient):
fallback 129.95 ms, THIS KERNEL 235.17 ms, zeros ceiling 92.97 ms — the
first cut LOSES 1.8x despite being exact. Hypotheses (see STATUS round 3):
the unrolled 9-tap loop keeps all tap slices + relayouts live (forcing small
batch tiles and small-M matmuls), and the dx ring-fold's many narrow concats
vectorize poorly. Off by default (VIDEOWALK_RCONV=on to enable) until a
variant measures faster.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TAPS = tuple((dy, dx) for dy in range(3) for dx in range(3))


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _sublanes(w: int, itemsize: int) -> int:
    """Second-to-last dim rounds up to the dtype's min tile (8 f32, 16 bf16)."""
    m = 32 // max(itemsize, 1)
    return -(-w // m) * m


def _tile_for(H: int, W: int, cin: int, cout: int, itemsize: int,
              fixed_bytes: int) -> int:
    """Batch-tile size from a closed-form VMEM-peak estimate (see module
    docstring); power of two in [4, 256].

    Measured calibration (v5e Mosaic stack peaks): the unrolled 9-tap loop
    keeps ALL tap slices and their 2-D relayouts live at once — at
    (16,16,64,64) bf16 nb=64 the compiler reported a 74.91 MB peak where a
    one-live-tap estimate predicted ~22 MB. Counting 9x live taps predicts
    55 MB for that point (remaining gap = partially-live concats), so the
    budget below keeps ~1.7x headroom under the raised 64 MB ceiling.
    """
    Wp = _sublanes(W, itemsize)
    Wp2 = _sublanes(W + 2, itemsize)
    per = ((H + 2) * Wp2 * cin * itemsize      # reflected frame
           + 9 * H * Wp * cin * itemsize       # tap slices (all live)
           + 9 * H * W * cin * itemsize        # their 2-D relayouts
           + H * W * cout * 4                  # f32 accumulator
           + 2 * H * Wp * cin * itemsize       # double-buffered in block
           + 2 * H * Wp * cout * itemsize)     # double-buffered out block
    nb = max(4, min(256, ((36 << 20) - fixed_bytes) // max(per, 1)))
    return 1 << (nb.bit_length() - 1)


# Raise the scoped-VMEM ceiling from its 16 MB default (v5e VMEM is far
# larger; standard practice for matmul-heavy kernels) and size batch tiles
# against a 36 MB budget with the 9x tap liveness counted (see _tile_for).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _reflect_frame(x):
    """(nb, H, W, C) -> (nb, H+2, W+2, C): reflect-pad by 1 (torch 'reflect'
    semantics: pad row -1 mirrors row 1), built with in-VMEM concats."""
    rows = jnp.concatenate([x[:, 1:2], x, x[:, -2:-1]], axis=1)
    return jnp.concatenate([rows[:, :, 1:2], rows, rows[:, :, -2:-1]], axis=2)


def _pad_batch(x, pad_n):
    if not pad_n:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((pad_n,) + x.shape[1:], x.dtype)])


# ------------------------------------------------------------------ forward


def _fwd_kernel(x_ref, w_ref, o_ref, acc_ref, *, H, W):
    nb, cin = x_ref.shape[0], x_ref.shape[-1]
    cout = o_ref.shape[-1]
    xp = _reflect_frame(x_ref[...])
    for t, (dy, dx) in enumerate(TAPS):
        xt = xp[:, dy:dy + H, dx:dx + W, :].reshape(nb * H * W, cin)
        c = jnp.dot(xt, w_ref[t], preferred_element_type=jnp.float32)
        if t == 0:
            acc_ref[...] = c
        else:
            acc_ref[...] += c
    o_ref[...] = acc_ref[...].reshape(nb, H, W, cout).astype(o_ref.dtype)


def _fwd_call(x, w9, interpret):
    N, H, W, cin = x.shape
    cout = w9.shape[-1]
    nb = _tile_for(H, W, cin, cout, x.dtype.itemsize, w9.size * w9.dtype.itemsize)
    pad_n = (-N) % nb
    x = _pad_batch(x, pad_n)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, H=H, W=W),
        grid=((N + pad_n) // nb,),
        in_specs=[
            pl.BlockSpec((nb, H, W, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, H, W, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N + pad_n, H, W, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((nb * H * W, cout), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(x, w9)
    return y[:N]


# ----------------------------------------------------------------- backward


def _dx_kernel(g_ref, wt_ref, o_ref, acc_ref, *, H, W):
    """dx = fold_reflect(full_corr(g, flip(W))): one kernel, no HBM pads."""
    g = g_ref[...]
    nb, cout = g.shape[0], g.shape[-1]
    cin = o_ref.shape[-1]
    z = functools.partial(jnp.zeros, dtype=g.dtype)
    gp = jnp.concatenate([z((nb, 2, W, cout)), g, z((nb, 2, W, cout))],
                         axis=1)
    gp = jnp.concatenate([z((nb, H + 4, 2, cout)), gp,
                          z((nb, H + 4, 2, cout))], axis=2)
    Hp, Wp = H + 2, W + 2
    for t, (ry, rx) in enumerate(TAPS):
        gt = gp[:, ry:ry + Hp, rx:rx + Wp, :].reshape(nb * Hp * Wp, cout)
        c = jnp.dot(gt, wt_ref[t], preferred_element_type=jnp.float32)
        if t == 0:
            acc_ref[...] = c
        else:
            acc_ref[...] += c
    dxp = acc_ref[...].reshape(nb, Hp, Wp, cin)

    # Fold the padded-frame ring back onto its reflected sources, assembled
    # row/column-wise (peak = one extra f32 map, not 8 zero-embedded ones).
    # Padded col 0 -> x col 1; padded col W+1 -> x col W-2 (all rows);
    # padded row 0/H+1 -> x rows 1/H-2, with their corners landing on
    # x cols 1/W-2 of those rows (the pad frame was built rows-then-cols).
    core = dxp[:, 1:H + 1, 1:W + 1]
    core = jnp.concatenate([
        core[:, :, 0:1],
        core[:, :, 1:2] + dxp[:, 1:H + 1, 0:1],
        core[:, :, 2:W - 2],
        core[:, :, W - 2:W - 1] + dxp[:, 1:H + 1, W + 1:W + 2],
        core[:, :, W - 1:],
    ], axis=2)

    def ring_row(row):  # (nb, 1, W+2, cin) padded row -> (nb, 1, W, cin)
        mid = row[:, :, 1:W + 1]
        return jnp.concatenate([
            mid[:, :, 0:1],
            mid[:, :, 1:2] + row[:, :, 0:1],
            mid[:, :, 2:W - 2],
            mid[:, :, W - 2:W - 1] + row[:, :, W + 1:W + 2],
            mid[:, :, W - 1:],
        ], axis=2)

    top = ring_row(dxp[:, 0:1])
    bot = ring_row(dxp[:, H + 1:H + 2])
    dx = jnp.concatenate([
        core[:, 0:1],
        core[:, 1:2] + top,
        core[:, 2:H - 2],
        core[:, H - 2:H - 1] + bot,
        core[:, H - 1:],
    ], axis=1)
    o_ref[...] = dx.astype(o_ref.dtype)


def _dx_call(g, w9, cin, interpret):
    N, H, W, cout = g.shape
    # flipped + transposed taps: wt[(ry, rx)] = W[2-ry, 2-rx].T
    wt = jnp.stack([w9[(2 - ry) * 3 + (2 - rx)].T for ry, rx in TAPS])
    nb = _tile_for(H + 2, W + 2, cout, cin, g.dtype.itemsize,
                   wt.size * wt.dtype.itemsize)
    pad_n = (-N) % nb
    g = _pad_batch(g, pad_n)
    dx = pl.pallas_call(
        functools.partial(_dx_kernel, H=H, W=W),
        grid=((N + pad_n) // nb,),
        in_specs=[
            pl.BlockSpec((nb, H, W, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cout, cin), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, H, W, cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N + pad_n, H, W, cin), g.dtype),
        scratch_shapes=[
            pltpu.VMEM((nb * (H + 2) * (W + 2), cin), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(g, wt)
    return dx[:N]


def _dw_kernel(x_ref, g_ref, dw_ref, *, H, W):
    """dW[t] = sum over batch tiles of x_tap^T @ g; the f32 output block is
    revisited across the inner (batch) grid dim and accumulated in place."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    nb, cin = x_ref.shape[0], x_ref.shape[-1]
    cout = g_ref.shape[-1]
    xp = _reflect_frame(x_ref[...])
    gm = g_ref[...].reshape(nb * H * W, cout)
    for t, (dy, dx) in enumerate(TAPS):
        xt = xp[:, dy:dy + H, dx:dx + W, :].reshape(nb * H * W, cin)
        dw_ref[t] += jax.lax.dot_general(
            xt, gm, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _dw_call(x, g, interpret):
    N, H, W, cin = x.shape
    cout = g.shape[-1]
    # Cout tile: keep the resident f32 accumulator under ~5 MB. The batch
    # dim is the INNER grid dim so the accumulator block is revisited
    # consecutively; x is re-read once per cout tile (J is 1 or 2 here).
    ct = cout
    while 9 * cin * ct * 4 > (5 << 20):
        ct //= 2
    nb = _tile_for(H, W, cin + cout, ct, x.dtype.itemsize, 9 * cin * ct * 4)
    pad_n = (-N) % nb
    x = _pad_batch(x, pad_n)
    g = _pad_batch(g, pad_n)
    dw = pl.pallas_call(
        functools.partial(_dw_kernel, H=H, W=W),
        grid=(cout // ct, (N + pad_n) // nb),
        in_specs=[
            pl.BlockSpec((nb, H, W, cin), lambda j, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, H, W, ct), lambda j, i: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9, cin, ct), lambda j, i: (0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, cin, cout), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(x, g)
    return dw


# -------------------------------------------------------------- public op


@jax.custom_vjp
def reflect_conv3x3(x: jax.Array, w: jax.Array) -> jax.Array:
    """y = conv_valid(reflect_pad(x, 1), w), 3x3 stride-1, NHWC/HWIO.

    Args:
      x: (N, H, W, Cin), 6 <= H, W (see rconv_supported).
      w: (3, 3, Cin, Cout) in x's compute dtype.
    Returns:
      (N, H, W, Cout) in x's dtype (f32 MXU accumulation inside).
    """
    w9 = w.reshape(9, w.shape[2], w.shape[3])
    return _fwd_call(x, w9, _should_interpret())


def _vjp_fwd(x, w):
    w9 = w.reshape(9, w.shape[2], w.shape[3])
    return _fwd_call(x, w9, _should_interpret()), (x, w9)


def _vjp_bwd(res, g):
    x, w9 = res
    interpret = _should_interpret()
    dx = _dx_call(g, w9, x.shape[-1], interpret)
    dw = _dw_call(x, g, interpret).astype(w9.dtype)
    return dx, dw.reshape(3, 3, w9.shape[1], w9.shape[2])


reflect_conv3x3.defvjp(_vjp_fwd, _vjp_bwd)


def rconv_supported(H: int, W: int, kernel: int, stride: int,
                    pad: int) -> bool:
    """Shape gate: the kernel covers every interior conv of the modified
    ResNet; stem/stride-2 keep the fallback (see module docstring)."""
    return kernel == 3 and stride == 1 and pad == 1 and H >= 6 and W >= 6 \
        and H <= 32 and W <= 32
