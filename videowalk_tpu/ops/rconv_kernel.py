"""Pallas TPU kernel: 3x3 stride-1 reflect-padded convolution (+ hand VJP).

Why this exists (measured on v5e, STATUS round 3): the reference's 'scratch'
encoder reflect-pads every spatial conv (/root/reference/code/resnet.py:30-36).
XLA:TPU runs zero-SAME convs at ~98% MFU (the L4 conv: 9.8 ms fwd+dW for
1.89 TFLOP), but reflect padding can't go through the conv op's padding arg,
and EVERY exact XLA-level rewrite measured loses: materialized pad + VALID
conv +2.0 ms/conv at L4 (misaligned 10x10 shapes + a 200 MB-scale HBM pad
round-trip), strip-conv corrections neutral (round 2), einsum ring
corrections WORSE (l4 16.8 vs 11.8 ms — round 3 "dots"). The per-stage
decomposition pins the whole 49 ms/step encoder gap on this
materialization/fusion overhead, so the only winning shape is ONE fused op
per conv with XLA-level matmul efficiency inside.

This is the v2 "flat-roll" formulation (v1 — reflected frame in VMEM + 9
slice/reshape taps — measured 235 vs 130 ms/step: each tap's
(nb,H,W,C)->(nb*H*W,C) collapse is a sublane relayout, 9 per conv per block;
see git history). Here the block is collapsed ONCE:

- the (g, H, W, C) input block becomes x2 = (g*H*W, C) — one lane-preserving
  reshape — and every tap (dy, dx) is a cheap static SUBLANE ROLL of x2 by
  (dy-1)*W + (dx-1) rows: no further relayouts, C stays on lanes, the MXU
  sees 9 aligned (M, C) @ (C, Cout) matmuls accumulated into one f32
  scratch.
- rolls wrap across row/image boundaries, but the wrapped rows are EXACTLY
  the rows whose receptive field crosses the reflect boundary; they are
  overwritten by masked selects that re-roll to the reflected source
  (pad row -1 mirrors row 1, col W mirrors col W-2, corners mirror
  diagonally — torch 'reflect' semantics). H, W are powers of two at every
  encoder shape (16, 8), so the row/col masks are iota bit-ops
  (w = p & (W-1), h = (p >> log2 W) & (H-1)) — no integer division.

The backward pass is two kernels of the same family:
- dx: per tap, c_t = g @ W[t]^T, then dx += roll(mask_k * c_t, +o_k) for
  each (mask, offset) leg of the forward select chain (the exact transpose
  of a masked-roll select is a roll of the masked cotangent).
- dW: rebuild the fixed tap view (same rolls/selects) and accumulate
  (C, M) @ (M, Cout) per tap across batch blocks through a revisited f32
  output block, tiled over Cout when the 9*C*Cout f32 accumulator would
  crowd VMEM.

Scope: kernel 3, stride 1, pad 1, H and W powers of two in [8, 32] — every
interior conv of the modified ResNet (layer1 16x16 through layer3/4 8x8 at
the bench regime). The stem (7x7/2) and the one stride-2 conv keep the
materialized-pad fallback; 1x1 convs have no padding at all.

Deployment verdict (v5e, 2026-08-17, per-conv fwd+bwd at the flagship
batch): WINS at 8x8 Cin=512 (17.3 vs 19.5 ms fallback), parity-to-loss at
256, loses badly at low C (the 9 taps are MXU-starved K=64 matmuls and the
output N=64 half-fills the MXU either way). ``reflect_conv2d`` auto-gates
it to the layer4 interior convs. Two tempting "improvements" measured and
REVERTED on same-process full-step A/B: widening the gate to layer4-conv1
(isolated win, full-step 125 -> 132.7 ms) and an offset-grouped dx with
cached shifts (fewer rolls, but larger live-set on Mosaic's stack —
neutral-to-slower). Lesson: isolated per-conv wins do not compose; gate
changes must be A/B'd on the full step.

Dead ends, do NOT rebuild (each was built, parity-pinned, and measured on
the full flagship step before deletion; git history holds the code):

- "tap-concat" (v5e, 2026-08-18): stacking the 9 fixed-tap views in a
  (9, M, C) buffer and contracting (tap, C) jointly in one dot_general —
  hoping Mosaic would lower K = 9*C as a single matmul for the MXU-starved
  low-C layers — fails Mosaic verification outright: `tpu.matmul` only
  supports a single size-1 contracting dim ("lhs contracting dims must be
  of size 1"). Physically building the (M, 9C) concat instead needs either
  a sublane relayout per tap (the v1 formulation, measured 235 vs 130
  ms/step) or lane-offset stores at multiples of C < 128 (misaligned at the
  C=64 layer the idea targeted). Deleted in round 3.
- "rowpad" v3 (v5e, 2026-08-19; full table in STATUS round-4 item 2): pad
  each image with its two reflect ROWS (image pitch (H+2)*W) and resolve
  the column reflect once into three buffers, making all 9 taps pure
  aligned rolls — 2 selects + ~10 rolls vs flat's ~16 + ~25. Structural
  LOSER at every gating (flat@L4 124.8 ms vs rowpad@L4 133.6, @L3+L4
  137.0, all interiors 180.4): the (H+2)/H padded rows multiply MXU time
  exactly where the kernel wins (~91% MFU at L4 — 1.25x rows is pure
  loss), and at low C the binding resource was never the VPU select chain
  but the K=64 MXU-starved matmuls, which rowpad inflates. Deleted in
  round 5 (pruning policy, CLAUDE.md; the VIDEOWALK_RCONV_ALGO env knob
  errors loudly now).

Exactness is pinned by tests/test_rconv_kernel.py against reflect-pad+VALID:
forward, input gradient, and kernel gradient.
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


# Raise the scoped-VMEM ceiling from its 16 MB default (v5e VMEM is far
# larger; standard practice for matmul-heavy kernels).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _g_for(HW: int, cin: int, cout: int, itemsize: int, n_live: int,
           temp_itemsize: int | None = None) -> int:
    """Images per block from a VMEM-peak estimate: x2 + ~n_live roll/select
    temporaries + the f32 accumulator + pallas's double-buffered in/out
    blocks, against a 30 MB budget. Power of two in [1, 128].

    Mosaic allocates kernel temporaries on a stack and does not free them
    across the unrolled 9-tap loop, so n_live must reflect the FULL chain of
    live roll/select products, not just one tap's: measured on v5e, the dx
    kernel at g=64 (HW=256, C=64) peaked at 77.75 MB — ~19 live f32 (M, C)
    buffers — against this estimate's original 30 MB. temp_itemsize defaults
    to itemsize (fwd temps are input-dtype rolls); the backward kernels pass
    4 because their temporaries are f32 matmul products."""
    c = max(cin, cout)
    t = itemsize if temp_itemsize is None else temp_itemsize
    per = (HW * c * t * (1 + n_live)              # x2 + live temps
           + HW * cout * 4                        # f32 accumulator
           + 2 * HW * cin * itemsize              # double-buffered in
           + 2 * HW * cout * itemsize)            # double-buffered out
    g = max(1, min(128, (30 << 20) // max(per, 1)))
    return 1 << (g.bit_length() - 1)


def _pad_batch(x, pad_n):
    if not pad_n:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((pad_n,) + x.shape[1:], x.dtype)])


def _shift(x2, o):
    """rows of x2 shifted so out[p] = x2[p + o] (cyclic; callers fix the
    wrapped rows). Static o -> lowers to two sublane slices + concat."""
    if o == 0:
        return x2
    return jnp.roll(x2, -o, axis=0)


def _edge_masks(M, H, W):
    """(M, 1) bool masks for first/last row/col of each image in the flat
    (g*H*W, C) layout. H, W powers of two -> pure bit ops on an iota."""
    p = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    w = p & (W - 1)
    h = (p >> (W.bit_length() - 1)) & (H - 1)
    return (h == 0), (h == H - 1), (w == 0), (w == W - 1)


def _fixed_tap(x2, dy, dx, H, W, masks):
    """x2 rows rearranged to tap (dy, dx)'s reflect sources (forward view)."""
    at_h0, at_h1, at_w0, at_w1 = masks
    xt = _shift(x2, (dy - 1) * W + (dx - 1))
    if dx == 0:
        xt = jnp.where(at_w0, _shift(x2, (dy - 1) * W + 1), xt)
    elif dx == 2:
        xt = jnp.where(at_w1, _shift(x2, (dy - 1) * W - 1), xt)
    if dy == 0:
        alt = _shift(x2, W + (dx - 1))
        if dx == 0:
            alt = jnp.where(at_w0, _shift(x2, W + 1), alt)
        elif dx == 2:
            alt = jnp.where(at_w1, _shift(x2, W - 1), alt)
        xt = jnp.where(at_h0, alt, xt)
    elif dy == 2:
        alt = _shift(x2, -W + (dx - 1))
        if dx == 0:
            alt = jnp.where(at_w0, _shift(x2, -W + 1), alt)
        elif dx == 2:
            alt = jnp.where(at_w1, _shift(x2, -W - 1), alt)
        xt = jnp.where(at_h1, alt, xt)
    return xt


def _leg_masks(dy, dx, masks):
    """Disjoint (mask, offset) legs of _fixed_tap's select chain, for the
    transposed (dx) kernel. Must partition rows exactly as the forward
    where-chain resolves them (row fix wins over col fix)."""
    at_h0, at_h1, at_w0, at_w1 = masks
    at_h = at_h0 if dy == 0 else (at_h1 if dy == 2 else None)
    at_c = at_w0 if dx == 0 else (at_w1 if dx == 2 else None)
    legs = []
    if at_h is not None:
        if at_c is None:
            legs.append(("h", at_h))
        else:
            legs.append(("h", at_h & ~at_c))
            legs.append(("hw", at_h & at_c))
    if at_c is not None:
        base = at_c if at_h is None else (at_c & ~at_h)
        legs.append(("c", base))
    inv = None
    for _, m in legs:
        inv = m if inv is None else (inv | m)
    legs.append(("int", ~inv if inv is not None else None))
    return legs


def _leg_offsets(dy, dx, W):
    """Offsets matching _leg_masks order: row legs, col leg, interior."""
    out = []
    row_w = {0: W, 2: -W}.get(dy)
    col_o = ((dy - 1) * W + 1) if dx == 0 else (
        ((dy - 1) * W - 1) if dx == 2 else None)
    if row_w is not None:
        if col_o is None:
            out.append(row_w + (dx - 1))
        else:
            out.append(row_w + (dx - 1))
            out.append(row_w + (1 if dx == 0 else -1))
    if col_o is not None:
        out.append(col_o)
    out.append((dy - 1) * W + (dx - 1))
    return out


# ------------------------------------------------------------------ forward


def _fwd_kernel(x_ref, w_ref, o_ref, acc_ref, *, H, W, g):
    cin = x_ref.shape[-1]
    cout = o_ref.shape[-1]
    M = g * H * W
    x2 = x_ref[...].reshape(M, cin)
    masks = _edge_masks(M, H, W)
    for t, (dy, dx) in enumerate(TAPS):
        xt = _fixed_tap(x2, dy, dx, H, W, masks)
        c = jnp.dot(xt, w_ref[t], preferred_element_type=jnp.float32)
        if t == 0:
            acc_ref[...] = c
        else:
            acc_ref[...] += c
    o_ref[...] = acc_ref[...].reshape(g, H, W, cout).astype(o_ref.dtype)


def _fwd_call(x, w9, interpret):
    N, H, W, cin = x.shape
    cout = w9.shape[-1]
    g = _g_for(H * W, cin, cout, x.dtype.itemsize, n_live=9)
    pad_n = (-N) % g
    x = _pad_batch(x, pad_n)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, H=H, W=W, g=g),
        grid=((N + pad_n) // g,),
        in_specs=[
            pl.BlockSpec((g, H, W, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, H, W, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N + pad_n, H, W, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((g * H * W, cout), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(x, w9)
    return y[:N]


# ------------------------------------------- forward + fused BN statistics
#
# VERDICT r4 #1: the one mapped-but-unattacked cost bucket is the BN
# stats/reduce fusions (20.5 ms of the 125 ms batch-8 step; 110.5 ms and
# growing superlinearly at batch 32 — STATUS round-4 item 3: the stats
# reductions stream the activation back FROM HBM instead of riding the conv
# epilogue's hot VMEM). This variant emits the per-channel batch-norm
# moments alongside the conv output while it is still in VMEM: one extra
# revisited (8, Cout) f32 output holds [sum(y); sum(y*y)] accumulated
# across batch blocks (rows 2..7 unused — sublane-tile padding). The
# following BatchNorm then needs NO reduce over the activation
# (models/resnet.py::FusedStatsBN consumes s1/s2 directly), eliminating one
# full HBM read of the activation per fused BN.
#
# Exactness notes:
# - moments are computed on the CAST output (yv = acc.astype(out_dtype)),
#   matching flax's _compute_stats which promotes the stored bf16/f32
#   activation to f32 (normalization.py): same rounding point, f32 sums.
# - `_pad_batch`'s zero images contribute exactly 0 to both sums (the conv
#   is linear and bias-free, and reflect rolls never read across image
#   boundaries — module docstring), so no in-kernel batch masking is
#   needed; the caller divides by the REAL N*H*W.
# - the sums accumulate sequentially across the 1-D grid (same revisited-
#   block pattern as the dW kernel), so they are deterministic.


def _fwd_kernel_st(x_ref, w_ref, o_ref, st_ref, acc_ref, *, H, W, g):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        st_ref[...] = jnp.zeros_like(st_ref)

    cin = x_ref.shape[-1]
    cout = o_ref.shape[-1]
    M = g * H * W
    x2 = x_ref[...].reshape(M, cin)
    masks = _edge_masks(M, H, W)
    for t, (dy, dx) in enumerate(TAPS):
        xt = _fixed_tap(x2, dy, dx, H, W, masks)
        c = jnp.dot(xt, w_ref[t], preferred_element_type=jnp.float32)
        if t == 0:
            acc_ref[...] = c
        else:
            acc_ref[...] += c
    yv = acc_ref[...].astype(o_ref.dtype)
    o_ref[...] = yv.reshape(g, H, W, cout)
    yf = yv.astype(jnp.float32)
    s1 = jnp.sum(yf, axis=0, keepdims=True)
    s2 = jnp.sum(yf * yf, axis=0, keepdims=True)
    st_ref[...] += jnp.concatenate(
        [s1, s2, jnp.zeros((6, cout), jnp.float32)], axis=0)


def _fwd_call_st(x, w9, interpret):
    N, H, W, cin = x.shape
    cout = w9.shape[-1]
    # n_live=11: the 9-tap roll/select chain plus the f32 yf copy the
    # moment sums read (2 input-dtype units at bf16)
    g = _g_for(H * W, cin, cout, x.dtype.itemsize, n_live=11)
    pad_n = (-N) % g
    x = _pad_batch(x, pad_n)
    y, st = pl.pallas_call(
        functools.partial(_fwd_kernel_st, H=H, W=W, g=g),
        grid=((N + pad_n) // g,),
        in_specs=[
            pl.BlockSpec((g, H, W, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g, H, W, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N + pad_n, H, W, cout), x.dtype),
            jax.ShapeDtypeStruct((8, cout), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((g * H * W, cout), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(x, w9)
    return y[:N], st


# -------------------------------------- forward + input BN-affine epilogue
#
# Phase 2 of the VERDICT r4 #1 attack ("and ideally the ReLU/residual
# epilogue"): when this kernel's INPUT is relu(BN(prev_conv_out)) — the
# conv1->bn1->relu->conv2 chain inside every block — the BN normalize in
# train mode is an affine a*x + b with per-channel
#   a = scale * rsqrt(var + eps),   b = bias - mean * a
# so the kernel can apply relu(a*x + b) to its input block IN VMEM and the
# normalized activation never exists in HBM at all: the separate
# normalize+relu elementwise fusion (read raw + write normed) and the
# conv's read of the normed tensor collapse into the conv's own read of
# the RAW activation. models/resnet.py::BNAffine produces (a, b) (flax
# semantics, running stats updated) and the raw activation flows straight
# from the previous conv into this one.
#
# Exactness: flax computes the normalize in f32 and casts to the compute
# dtype, then relu — max(cast(ax+b), 0) == cast(max(ax+b, 0)) for any
# monotone rounding that preserves 0 (bf16/f32 do), so computing
# relu-in-f32 then casting matches the unfused chain bit-for-bit at the
# rounding points. The batch-moment outputs are masked against
# ``_pad_batch``'s zero images (relu(b) makes their xn nonzero, unlike the
# plain variants), using the static real batch size; the garbage pad-image
# OUTPUT rows are discarded by the same [:N] slice as always, and the
# backward needs no masking at all: the incoming cotangent's pad rows are
# zero and every roll/select leg stays within its image (module note), so
# dxn, da, db, and dW see exact zeros from pad images.
#
# VJP: xn = relu(a*x + b) gives dx = a * (xn > 0) * dxn with dxn the plain
# kernel's select-chain transpose — folded into the dx kernel (x, a, b
# ride along as inputs; the relu mask is recomputed in VMEM) — and
#   da[c] = sum_p dxn[p,c] * relu'[p,c] * x[p,c]
#   db[c] = sum_p dxn[p,c] * relu'[p,c]
# accumulated through a revisited (8, Cin) f32 output exactly like the
# moment rows. The dW kernel rebuilds the xn tap views from the raw block
# (one extra fused elementwise transform per block, zero extra HBM). The
# (a, b) -> (scale, bias, mean, var) chain stays at the jax level, so BN's
# parameter/statistic gradients come from autodiff of two per-channel
# scalars — no custom math outside the kernel.


def _bnin(x2, ab_ref):
    """relu(a*x + b) on the flat block, f32 math, cast back to x's dtype."""
    a = ab_ref[0:1, :]
    b = ab_ref[1:2, :]
    xf = x2.astype(jnp.float32)
    return jnp.maximum(xf * a + b, 0.0).astype(x2.dtype)


def _fwd_kernel_bnin_st(x_ref, ab_ref, w_ref, o_ref, st_ref, acc_ref, *,
                        H, W, g, n_real):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        st_ref[...] = jnp.zeros_like(st_ref)

    cin = x_ref.shape[-1]
    cout = o_ref.shape[-1]
    M = g * H * W
    xn = _bnin(x_ref[...].reshape(M, cin), ab_ref)
    masks = _edge_masks(M, H, W)
    for t, (dy, dx) in enumerate(TAPS):
        xt = _fixed_tap(xn, dy, dx, H, W, masks)
        c = jnp.dot(xt, w_ref[t], preferred_element_type=jnp.float32)
        if t == 0:
            acc_ref[...] = c
        else:
            acc_ref[...] += c
    yv = acc_ref[...].astype(o_ref.dtype)
    o_ref[...] = yv.reshape(g, H, W, cout)
    # batch moments of the CAST output, pad images masked out (their xn is
    # relu(b) != 0, so unlike the plain variants their y is garbage)
    p = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    img = i * g + (p >> ((H * W).bit_length() - 1))
    yf = jnp.where(img < n_real, yv.astype(jnp.float32), 0.0)
    s1 = jnp.sum(yf, axis=0, keepdims=True)
    s2 = jnp.sum(yf * yf, axis=0, keepdims=True)
    st_ref[...] += jnp.concatenate(
        [s1, s2, jnp.zeros((6, cout), jnp.float32)], axis=0)


def _pack_ab(a, b, cin):
    ab = jnp.zeros((8, cin), jnp.float32)
    ab = ab.at[0].set(a.astype(jnp.float32))
    return ab.at[1].set(b.astype(jnp.float32))


def _fwd_call_bnin_st(x, a, b, w9, interpret):
    N, H, W, cin = x.shape
    cout = w9.shape[-1]
    g = _g_for(H * W, cin, cout, x.dtype.itemsize, n_live=13)
    pad_n = (-N) % g
    x = _pad_batch(x, pad_n)
    y, st = pl.pallas_call(
        functools.partial(_fwd_kernel_bnin_st, H=H, W=W, g=g, n_real=N),
        grid=((N + pad_n) // g,),
        in_specs=[
            pl.BlockSpec((g, H, W, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g, H, W, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N + pad_n, H, W, cout), x.dtype),
            jax.ShapeDtypeStruct((8, cout), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((g * H * W, cout), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(x, _pack_ab(a, b, cin), w9)
    return y[:N], st


def _dx_kernel_bnin(g_ref, x_ref, ab_ref, wt_ref, o_ref, dab_ref, acc_ref,
                    *, H, W, g):
    """dx = a * relu' * (select-chain transpose of g); da/db accumulate
    through the revisited (8, Cin) output (rows [da; db])."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dab_ref[...] = jnp.zeros_like(dab_ref)

    cout = g_ref.shape[-1]
    cin = o_ref.shape[-1]
    M = g * H * W
    g2 = g_ref[...].reshape(M, cout)
    masks = _edge_masks(M, H, W)
    first = True
    for t, (dy, dx) in enumerate(TAPS):
        c = jnp.dot(g2, wt_ref[t], preferred_element_type=jnp.float32)
        legs_m = _leg_masks(dy, dx, masks)
        legs_o = _leg_offsets(dy, dx, W)
        for (_, m), o in zip(legs_m, legs_o):
            term = c if m is None else jnp.where(m, c, 0.0)
            term = jnp.roll(term, o, axis=0) if o else term
            if first:
                acc_ref[...] = term
                first = False
            else:
                acc_ref[...] += term
    a = ab_ref[0:1, :]
    b = ab_ref[1:2, :]
    xf = x_ref[...].reshape(M, cin).astype(jnp.float32)
    relu_g = jnp.where(xf * a + b > 0.0, 1.0, 0.0)
    dxn = acc_ref[...] * relu_g          # dxn gated by relu'
    o_ref[...] = (dxn * a).reshape(g, H, W, cin).astype(o_ref.dtype)
    da = jnp.sum(dxn * xf, axis=0, keepdims=True)
    db = jnp.sum(dxn, axis=0, keepdims=True)
    dab_ref[...] += jnp.concatenate(
        [da, db, jnp.zeros((6, cin), jnp.float32)], axis=0)


def _dx_call_bnin(gy, x, a, b, w9, interpret):
    N, H, W, cout = gy.shape
    cin = x.shape[-1]
    wt = jnp.swapaxes(w9, 1, 2)
    g = _g_for(H * W, max(cout, cin), cin, gy.dtype.itemsize, n_live=23,
               temp_itemsize=4)
    pad_n = (-N) % g
    gy = _pad_batch(gy, pad_n)
    x = _pad_batch(x, pad_n)
    dx, dab = pl.pallas_call(
        functools.partial(_dx_kernel_bnin, H=H, W=W, g=g),
        grid=((N + pad_n) // g,),
        in_specs=[
            pl.BlockSpec((g, H, W, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, H, W, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cout, cin), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g, H, W, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N + pad_n, H, W, cin), gy.dtype),
            jax.ShapeDtypeStruct((8, cin), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((g * H * W, cin), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(gy, x, _pack_ab(a, b, cin), wt)
    return dx[:N], dab[0], dab[1]


def _dw_kernel_bnin(x_ref, ab_ref, g_ref, dw_ref, *, H, W, g):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    cin = x_ref.shape[-1]
    cout = g_ref.shape[-1]
    M = g * H * W
    xn = _bnin(x_ref[...].reshape(M, cin), ab_ref)
    gm = g_ref[...].reshape(M, cout)
    masks = _edge_masks(M, H, W)
    for t, (dy, dx) in enumerate(TAPS):
        xt = _fixed_tap(xn, dy, dx, H, W, masks)
        dw_ref[t] += jax.lax.dot_general(
            xt, gm, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _dw_call_bnin(x, a, b, gy, interpret):
    N, H, W, cin = x.shape
    cout = gy.shape[-1]
    ct = cout
    while 9 * cin * ct * 4 > (5 << 20):
        ct //= 2
    g = _g_for(H * W, cin + cout, ct, x.dtype.itemsize, n_live=14,
               temp_itemsize=4)
    pad_n = (-N) % g
    x = _pad_batch(x, pad_n)
    gy = _pad_batch(gy, pad_n)
    dw = pl.pallas_call(
        functools.partial(_dw_kernel_bnin, H=H, W=W, g=g),
        grid=(cout // ct, (N + pad_n) // g),
        in_specs=[
            pl.BlockSpec((g, H, W, cin), lambda j, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cin), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, H, W, ct), lambda j, i: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9, cin, ct), lambda j, i: (0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, cin, cout), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(x, _pack_ab(a, b, cin), gy)
    return dw


# ----------------------------------------------------------------- backward


def _dx_kernel(g_ref, wt_ref, o_ref, acc_ref, *, H, W, g):
    """dx = sum over taps of the select-chain transpose: for each leg
    (mask, o) of the forward view, dx += roll(mask * (g @ W[t]^T), +o)."""
    cout = g_ref.shape[-1]
    cin = o_ref.shape[-1]
    M = g * H * W
    g2 = g_ref[...].reshape(M, cout)
    masks = _edge_masks(M, H, W)
    first = True
    for t, (dy, dx) in enumerate(TAPS):
        c = jnp.dot(g2, wt_ref[t], preferred_element_type=jnp.float32)
        legs_m = _leg_masks(dy, dx, masks)
        legs_o = _leg_offsets(dy, dx, W)
        assert len(legs_m) == len(legs_o)
        for (_, m), o in zip(legs_m, legs_o):
            term = c if m is None else jnp.where(m, c, 0.0)
            # forward: xt[p] = x[p + o]  =>  transpose: dx[q] += term[q - o]
            term = jnp.roll(term, o, axis=0) if o else term
            if first:
                acc_ref[...] = term
                first = False
            else:
                acc_ref[...] += term
    o_ref[...] = acc_ref[...].reshape(g, H, W, cin).astype(o_ref.dtype)


def _dx_call(gy, w9, cin, interpret):
    N, H, W, cout = gy.shape
    # transposed taps: wt[t] = W[t].T (the roll transpose handles flips)
    wt = jnp.swapaxes(w9, 1, 2)
    g = _g_for(H * W, cout, cin, gy.dtype.itemsize, n_live=20,
               temp_itemsize=4)
    pad_n = (-N) % g
    gy = _pad_batch(gy, pad_n)
    dx = pl.pallas_call(
        functools.partial(_dx_kernel, H=H, W=W, g=g),
        grid=((N + pad_n) // g,),
        in_specs=[
            pl.BlockSpec((g, H, W, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cout, cin), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, H, W, cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N + pad_n, H, W, cin), gy.dtype),
        scratch_shapes=[pltpu.VMEM((g * H * W, cin), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(gy, wt)
    return dx[:N]


def _dw_kernel(x_ref, g_ref, dw_ref, *, H, W, g):
    """dW[t] = sum over batch blocks of fixed_tap(x)^T @ g; the f32 output
    block is revisited across the inner (batch) grid dim."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    cin = x_ref.shape[-1]
    cout = g_ref.shape[-1]
    M = g * H * W
    x2 = x_ref[...].reshape(M, cin)
    gm = g_ref[...].reshape(M, cout)
    masks = _edge_masks(M, H, W)
    for t, (dy, dx) in enumerate(TAPS):
        xt = _fixed_tap(x2, dy, dx, H, W, masks)
        dw_ref[t] += jax.lax.dot_general(
            xt, gm, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _dw_call(x, gy, interpret):
    N, H, W, cin = x.shape
    cout = gy.shape[-1]
    # Cout tile: keep the resident f32 accumulator under ~5 MB. The batch
    # dim is the INNER grid dim so the accumulator block is revisited
    # consecutively; x is re-read once per cout tile (J is 1 or 2 here).
    ct = cout
    while 9 * cin * ct * 4 > (5 << 20):
        ct //= 2
    g = _g_for(H * W, cin + cout, ct, x.dtype.itemsize, n_live=12,
               temp_itemsize=4)
    pad_n = (-N) % g
    x = _pad_batch(x, pad_n)
    gy = _pad_batch(gy, pad_n)
    dw = pl.pallas_call(
        functools.partial(_dw_kernel, H=H, W=W, g=g),
        grid=(cout // ct, (N + pad_n) // g),
        in_specs=[
            pl.BlockSpec((g, H, W, cin), lambda j, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, H, W, ct), lambda j, i: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9, cin, ct), lambda j, i: (0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, cin, cout), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(x, gy)
    return dw


# -------------------------------------------------------------- public op


@jax.custom_vjp
def reflect_conv3x3(x: jax.Array, w: jax.Array) -> jax.Array:
    """y = conv_valid(reflect_pad(x, 1), w), 3x3 stride-1, NHWC/HWIO.

    Args:
      x: (N, H, W, Cin), H and W powers of two (see rconv_supported).
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


@jax.custom_vjp
def reflect_conv3x3_stats(x: jax.Array, w: jax.Array):
    """:func:`reflect_conv3x3` plus fused batch-norm moments.

    Returns ``(y, s1, s2)`` where ``s1[c] = sum(y[..., c])`` and
    ``s2[c] = sum(y[..., c]**2)`` over all N*H*W positions, reduced in f32
    in VMEM while the conv output is still resident (see the module note
    above ``_fwd_kernel_st``). The following BatchNorm computes
    mean = s1/count, var = max(0, s2/count - mean^2) with count = N*H*W —
    flax's fast-variance formula on the same cast values — without ever
    re-reading ``y`` from HBM for the reduction.

    The VJP folds the moment cotangents into the conv cotangent
    (d(s1)/dy = 1, d(s2)/dy = 2y -> gy_eff = gy + gs1 + 2*y*gs2, one XLA
    elementwise fusion over arrays the BN backward touches anyway) and
    reuses the plain kernel's dx/dW passes.
    """
    w9 = w.reshape(9, w.shape[2], w.shape[3])
    y, st = _fwd_call_st(x, w9, _should_interpret())
    return y, st[0], st[1]


def _vjp_fwd_st(x, w):
    w9 = w.reshape(9, w.shape[2], w.shape[3])
    y, st = _fwd_call_st(x, w9, _should_interpret())
    # y is also a residual of the consuming BN's normalize, so saving it
    # here costs no extra HBM (one buffer, two jaxpr uses)
    return (y, st[0], st[1]), (x, w9, y)


def _vjp_bwd_st(res, cts):
    x, w9, y = res
    gy, gs1, gs2 = cts
    gy_eff = (gy.astype(jnp.float32) + gs1[None, None, None, :]
              + 2.0 * y.astype(jnp.float32) * gs2[None, None, None, :])
    gy_eff = gy_eff.astype(gy.dtype)
    interpret = _should_interpret()
    dx = _dx_call(gy_eff, w9, x.shape[-1], interpret)
    dw = _dw_call(x, gy_eff, interpret).astype(w9.dtype)
    return dx, dw.reshape(3, 3, w9.shape[1], w9.shape[2])


reflect_conv3x3_stats.defvjp(_vjp_fwd_st, _vjp_bwd_st)


@jax.custom_vjp
def reflect_conv3x3_bnin_stats(x: jax.Array, a: jax.Array, b: jax.Array,
                               w: jax.Array):
    """Reflect conv of ``relu(a*x + b)`` plus fused batch moments.

    The input-side BN-affine epilogue (module note above
    ``_fwd_kernel_bnin_st``): ``x`` is the PREVIOUS conv's raw output,
    ``(a, b)`` the per-channel train-mode BN affine from
    ``models/resnet.py::BNAffine`` — the normalized activation is computed
    in VMEM and never written to HBM. Returns ``(y, s1, s2)`` with the same
    moment contract as :func:`reflect_conv3x3_stats` (for the FOLLOWING
    BN). Gradients flow to x, a, b, and w.
    """
    w9 = w.reshape(9, w.shape[2], w.shape[3])
    y, st = _fwd_call_bnin_st(x, a, b, w9, _should_interpret())
    return y, st[0], st[1]


def _vjp_fwd_bnin(x, a, b, w):
    w9 = w.reshape(9, w.shape[2], w.shape[3])
    y, st = _fwd_call_bnin_st(x, a, b, w9, _should_interpret())
    return (y, st[0], st[1]), (x, a, b, w9, y)


def _vjp_bwd_bnin(res, cts):
    x, a, b, w9, y = res
    gy, gs1, gs2 = cts
    gy_eff = (gy.astype(jnp.float32) + gs1[None, None, None, :]
              + 2.0 * y.astype(jnp.float32) * gs2[None, None, None, :])
    gy_eff = gy_eff.astype(gy.dtype)
    interpret = _should_interpret()
    dx, da, db = _dx_call_bnin(gy_eff, x, a, b, w9, interpret)
    dw = _dw_call_bnin(x, a, b, gy_eff, interpret).astype(w9.dtype)
    return (dx, da.astype(a.dtype), db.astype(b.dtype),
            dw.reshape(3, 3, w9.shape[1], w9.shape[2]))


reflect_conv3x3_bnin_stats.defvjp(_vjp_fwd_bnin, _vjp_bwd_bnin)


def rconv_supported(H: int, W: int, kernel: int, stride: int,
                    pad: int) -> bool:
    """Shape gate: flat-roll masks need power-of-two H, W (bit-op
    row/col extraction); covers every interior conv of the modified
    ResNet. Stem/stride-2 keep the fallback (module docstring)."""
    return (kernel == 3 and stride == 1 and pad == 1
            and 8 <= H <= 32 and 8 <= W <= 32
            and (H & (H - 1)) == 0 and (W & (W - 1)) == 0)
