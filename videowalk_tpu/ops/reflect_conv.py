"""Fused reflect-pad convolution: zero-SAME conv + additive ring correction.

The reference's 'scratch' encoder reflect-pads every spatial conv
(code/resnet.py:30-36). Round 1 implemented that as an explicit reflect pad
(scatter-free VJP, ops/reflect_pad.py) + VALID conv, which still left a
measured gap against zero padding — at the bench regime (64px patch encodes)
the encoder runs 11.3 ms fwd+bwd reflect vs 8.2 ms zeros: the materialized
66x66 pad copy and the off-tile padded shapes tax both the forward conv and
both gradient convs.

This module removes the padded big conv entirely. Reflect-pad decomposes as

    reflect_pad(x) = zero_pad(x) + R

where R is nonzero only on the pad frame, and conv is linear, so

    conv_valid(reflect_pad(x)) = conv_same_zero(x) + conv_valid(R).

R splits disjointly into four bands — top/bottom rows [0,P) and [H+P,H+2P)
across the full padded width (corners included), and left/right columns
restricted to the interior rows — so conv_valid(R) is four *thin strip*
convs whose outputs are small deltas confined to the first/last ceil(P/s)
output rows/cols. The deltas are zero-padded to the output shape and ADDED
(not overwritten): XLA fuses the pad+add chain into the main conv's consumer,
no full-tensor concats, and the decomposition stays exact even when bands
overlap a single receptive field (linearity). Top+bottom and left+right
strips are batch-stacked into one conv each when their shapes match (always
true for stride-1 convs); four separate strip convs were measured slower
(per-conv dispatch/layout overhead beats the concat's copy cost).

Exactness (not approximation) is pinned by tests/test_reflect_conv.py:
forward + input-gradient + kernel-gradient parity against pad-then-VALID
across kernel/stride/pad sweeps.

Strip extents (P = pad, K = kernel, s = stride, Hout = floor((H+2P-K)/s)+1):

    rT = ceil(P/s)                     rows whose field starts above row P
    rB = Hout-1 - floor((H+P-K)/s)     rows whose field ends below row H+P
    h_top = (rT-1)*s + K               padded rows the top strip spans
    h_bot = H + 2P - (Hout-rB)*s       padded rows the bottom strip spans
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import flax.linen as nn

from videowalk_tpu.ops.reflect_pad import reflect_pad_hw


class PadConv(nn.Module):
    """Bias-free Conv2D whose padding is a *call* argument, not a module
    attribute, so the main conv (built-in zero padding — no materialized pad
    copy) and the strip convs (VALID) share one kernel parameter.

    Param layout matches ``nn.Conv`` (``kernel``: (K, K, Cin, Cout)) so .pth
    checkpoint mapping (utils/checkpoint.py) is unchanged. Measured: an
    explicit ``jnp.pad`` feeding a VALID conv is NOT folded into the conv by
    XLA:TPU — the padded copy materializes and off-tile shapes tax fwd+bwd
    (11.4 vs 8.1 ms at the 64px bench regime) — so padding must go through
    the conv op itself wherever it is zero.
    """

    features: int
    kernel: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding, bn_affine=None):
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, x.shape[-1], self.features),
            jnp.float32)
        xc, wc = x.astype(self.dtype), w.astype(self.dtype)
        if padding in ("REFLECT_KERNEL", "REFLECT_KERNEL_STATS",
                       "REFLECT_KERNEL_BNIN_STATS"):
            # fused Pallas reflect conv (ops/rconv_kernel.py): reflect
            # indexing in VMEM, no HBM pad copy, hand VJP. The _STATS mode
            # additionally returns the per-channel BN moments (y, s1, s2)
            # reduced in VMEM; _BNIN_STATS also applies the PRECEDING BN's
            # affine + relu to the input block in VMEM (bn_affine=(a, b)
            # f32 from models/resnet.py::BNAffine). Callers gate both on
            # rconv_kernel_routes so they can only be requested where the
            # kernel path is live.
            from videowalk_tpu.ops.rconv_kernel import (
                reflect_conv3x3, reflect_conv3x3_bnin_stats,
                reflect_conv3x3_stats)

            algo = os.environ.get("VIDEOWALK_RCONV_ALGO", "flat")
            if algo != "flat":
                # 'rowpad' was a measured structural loser, deleted by the
                # round-5 pruning policy (verdict in rconv_kernel.py's
                # module docstring; code in git history)
                raise ValueError(
                    f"VIDEOWALK_RCONV_ALGO={algo!r}: only 'flat' exists "
                    f"(rowpad was measured a loser and pruned; see "
                    f"rconv_kernel.py docstring / git history)")
            if padding == "REFLECT_KERNEL_BNIN_STATS":
                a, b = bn_affine
                return reflect_conv3x3_bnin_stats(xc, a, b, wc)
            if padding == "REFLECT_KERNEL_STATS":
                return reflect_conv3x3_stats(xc, wc)
            return reflect_conv3x3(xc, wc)
        if padding == "RING_DOTS":
            y = self._plain_conv(xc, wc, [(1, 1), (1, 1)])
            return _ring_dots_delta(xc, wc, y)
        pads = ([(0, 0), (0, 0)] if padding == "VALID" else list(padding))
        return self._plain_conv(xc, wc, pads)

    def _plain_conv(self, xc, wc, pads):
        # Pruned experiment (round 5; code in git history): VIDEOWALK_L1PACK
        # packed image PAIRS along channels with a block-diagonal kernel to
        # "fill" layer1's half-width K=N=64 matmuls. MEASURED LOSER on v5e
        # (2026-08-19) and, more importantly, the measurement retired the
        # MXU-starvation theory of layer1: the PLAIN 18x18x64 VALID fwd+bwd
        # conv runs 0.83 ms at B=3136 — already at its ~0.9 ms analytic
        # floor — so layer1's in-context cost is the reflect-pad
        # materialization fusions AROUND the conv, not the matmul. Packed:
        # 5.42 ms isolated, 133.1 vs 124.9 ms full-step. Do not rebuild.
        if self.kernel > 1 and jax.default_backend() == "cpu":
            # XLA:CPU executes small-spatial / high-channel convs through a
            # pathological path — measured 1.6 s for ONE (196,2,2,256)->512
            # 3x3 conv vs 46 ms as an im2col matmul (35x; the conv gradient
            # is 24x worse) — which made every CPU test minutes long. Lower
            # to im2col whenever the output map is small. TPU never takes
            # this branch; numerics agree to matmul reassociation (~1e-6
            # relative, checked in tests/test_reflect_conv.py).
            h_out = (xc.shape[1] + sum(pads[0]) - self.kernel) // self.stride + 1
            w_out = (xc.shape[2] + sum(pads[1]) - self.kernel) // self.stride + 1
            if h_out * w_out <= 64:
                pat = jax.lax.conv_general_dilated_patches(
                    xc, (self.kernel, self.kernel),
                    (self.stride, self.stride), pads,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                wm = wc.transpose(2, 0, 1, 3).reshape(pat.shape[-1],
                                                      self.features)
                return (pat.reshape(-1, pat.shape[-1]) @ wm).reshape(
                    pat.shape[0], h_out, w_out, self.features)
        return jax.lax.conv_general_dilated(
            xc, wc, window_strides=(self.stride, self.stride),
            padding=pads, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _ring_dots_delta(x: jax.Array, w: jax.Array, y: jax.Array) -> jax.Array:
    """Add the reflect-ring correction to a zero-SAME 3x3/s1 conv output —
    as two batched DOTS, not strip convs.

    Same exact decomposition as the strip path (module docstring):
    conv_reflect(x) = conv_same_zero(x) + conv(ring), where the ring holds
    the reflected halo. The round-2 strip formulation computed the
    correction with extra conv ops and measured NEUTRAL on v5e — each conv
    lowers to a custom call with ~110 us fixed cost, re-spending exactly
    what the aligned main conv saves. Here the four 1-wide ring bands become
    1-D convs along the edges, im2col'd in-registers (two shifted slices +
    channel concat) and contracted as one (2, B*L, 3*Cin) @ (2, 3*Cin, Cout)
    einsum per orientation — native HLO dots that XLA fuses with their
    slice/pad producers, no custom-call glue.

    Measured (v5e flagship step, 2026-08-17, one process): dots 145.1 ms vs
    materialized-pad fallback 129.8 ms vs zeros ceiling ~93 ms — the dots
    glue costs MORE than the pad it removes, the second exact interior-conv
    rewrite (after round 2's strip convs) that fails to recover the
    reflect-vs-zeros gap. Kept as an exact, tested alternative
    (VIDEOWALK_REFLECT_FUSE=dots); the gap evidently does not live in the
    interior-conv padding path (see STATUS round 3 decomposition).

    Corner accounting (each padded corner must be counted ONCE): the
    top/bottom edge strips use REFLECT ends — padrow[-1] = x[1, 1] is
    exactly the (-1, -1) reflect-corner value — while the left/right strips
    use ZERO ends, so corner taps live only in the horizontal strips.

    Scope: kernel 3, stride 1, pad 1, H >= 2, W >= 2 (reflect needs
    H, W >= 2; all 15 interior convs of the modified ResNet qualify).
    """
    B, H, W, cin = x.shape
    cout = w.shape[-1]
    f32 = jnp.float32

    # horizontal edges (output rows 0 and H-1): pad rows -1/H mirror rows
    # 1/H-2; taps w[0] (top) and w[2] (bottom), reflect-extended ends.
    hs = jnp.stack([x[:, 1], x[:, H - 2]])                  # (2, B, W, Cin)
    left_n = jnp.concatenate([hs[:, :, 1:2], hs[:, :, :-1]], axis=2)
    right_n = jnp.concatenate([hs[:, :, 1:], hs[:, :, W - 2:W - 1]], axis=2)
    hcol = jnp.concatenate([left_n, hs, right_n], axis=-1)  # (2,B,W,3Cin)
    hw = jnp.stack([w[0], w[2]]).reshape(2, 3 * cin, cout)
    hd = jnp.einsum("sbwc,scd->sbwd", hcol, hw,
                    preferred_element_type=f32).astype(y.dtype)

    # vertical edges (output cols 0 and W-1): pad cols -1/W mirror cols
    # 1/W-2; taps w[:, 0] / w[:, 2], ZERO ends (corners already counted).
    vs = jnp.stack([x[:, :, 1], x[:, :, W - 2]])            # (2, B, H, Cin)
    zrow = jnp.zeros_like(vs[:, :, :1])
    up_n = jnp.concatenate([zrow, vs[:, :, :-1]], axis=2)
    down_n = jnp.concatenate([vs[:, :, 1:], zrow], axis=2)
    vcol = jnp.concatenate([up_n, vs, down_n], axis=-1)
    vw = jnp.stack([w[:, 0], w[:, 2]]).reshape(2, 3 * cin, cout)
    vd = jnp.einsum("sbhc,scd->sbhd", vcol, vw,
                    preferred_element_type=f32).astype(y.dtype)

    y = y.at[:, 0].add(hd[0])
    y = y.at[:, H - 1].add(hd[1])
    y = y.at[:, :, 0].add(vd[0])
    y = y.at[:, :, W - 1].add(vd[1])
    return y


def _fuse_mode() -> str:
    """VIDEOWALK_REFLECT_FUSE: auto (default) | always | never | dots.

    Measured verdict on v5e (see module docstring): the strip rewrite lands
    within noise of the materialized-pad fallback at both the 64px patch
    regime (11.9-12.0 vs 11.2-12.0 ms) and 256^2 — the strip convs' fixed
    per-op cost eats exactly what the aligned main conv saves — so ``auto``
    keeps the simpler fallback and ``always`` opts into the fused rewrite
    (still exact; kept under test for future XLA/hardware generations).
    """
    return os.environ.get("VIDEOWALK_REFLECT_FUSE", "auto")


def _band_counts(n: int, kernel: int, stride: int, pad: int):
    """(#leading, #trailing) outputs whose receptive field touches the pad
    frame along one axis, plus the padded-row extents their strips span."""
    n_out = (n + 2 * pad - kernel) // stride + 1
    lead = min(-(-pad // stride), n_out)                       # ceil(P/s)
    trail_start = (n + pad - kernel) // stride + 1             # first touching
    trail = max(n_out - max(trail_start, 0), 0)
    trail = min(trail, n_out)
    lead_extent = (lead - 1) * stride + kernel if lead else 0
    trail_extent = n + 2 * pad - (n_out - trail) * stride if trail else 0
    return n_out, lead, trail, lead_extent, trail_extent


def _pad_to(d: jax.Array, h_out: int, w_out: int, row0: int,
            col0: int) -> jax.Array:
    """Zero-embed a delta block at (row0, col0) of the (h_out, w_out) map."""
    return jnp.pad(d, ((0, 0), (row0, h_out - row0 - d.shape[1]),
                       (col0, w_out - col0 - d.shape[2]), (0, 0)))


def rconv_kernel_routes(H: int, W: int, C: int, features: int,
                        kernel: int = 3, stride: int = 1,
                        pad: int = 1) -> bool:
    """True iff :func:`reflect_conv2d` routes this conv geometry through the
    Pallas kernel under the CURRENT env gates (trace-time decision).

    Shared with the BN-stats fusion gate in ``models/resnet.py`` so the two
    decisions can never disagree (the _STATS PadConv mode is only valid
    where the kernel path is live).

    VIDEOWALK_RCONV: auto (default) | on | off. The fused Pallas reflect
    conv (ops/rconv_kernel.py) is exact everywhere it claims support
    (tests/test_rconv_kernel.py), but only WINS on the deep high-channel
    shapes — per-conv fwd+bwd at the flagship batch (v5e, 2026-08-17):
    8x8x512 kernel 17.3 vs fallback 19.5 ms; 8x8x256 5.3 vs 5.0;
    8x8x128 1.9 vs 1.1; 16x16x64 9.4 vs 3.4 (the low-C taps are 9
    MXU-starved K=64 matmuls). ``auto`` therefore routes only the
    measured-winning shapes (8x8, Cin >= 512 — layer4 interior, ~60% of
    the reflect-vs-zeros gap) through the kernel, on TPU only; ``on``
    forces it for every supported shape.

    VIDEOWALK_RCONV_MIN_C: auto-gate channel floor. 512 = the measured-
    winning layer4 interiors; 256 would add the layer3 interiors (A/B'd
    full-step before any default change — the layer4-conv1 widening trap
    in rconv_kernel.py's docstring). VIDEOWALK_RCONV_ALLOW16=1 additionally
    admits 16x16 interiors (layer1). 32x32 interiors — the layer3/4
    geometry at 256px inputs (superpixel mode), which the 8x8-flagship
    per-conv measurements never covered — route by DEFAULT: measured a
    consistent winner at the sp config of record (tools/ab_sp32.py, v5e
    2026-08-20, three same-process A/B/As: sp 25.12 vs 25.41-25.68 ms,
    sp_dil 32.49 vs 32.87-32.93 — M=1024 rows/image fill the MXU where
    8x8's M=64 could not); VIDEOWALK_RCONV_ALLOW32=0 is the kill switch.
    MIN_C=256 at 32x32 (layer3 routing) measured NEUTRAL (25.16/25.28
    split across runs) — min_c stays 512. All knobs keep the
    interior-only and min_c constraints so an A/B can widen one axis at
    a time.
    """
    rmode = os.environ.get("VIDEOWALK_RCONV", "auto")
    if rmode not in ("on", "auto"):
        return False
    from videowalk_tpu.ops.rconv_kernel import rconv_supported

    if not rconv_supported(H, W, kernel, stride, pad):
        return False
    if rmode == "on":
        return True
    min_c = int(os.environ.get("VIDEOWALK_RCONV_MIN_C", "512"))
    allow16 = os.environ.get("VIDEOWALK_RCONV_ALLOW16", "") not in ("", "0")
    allow32 = os.environ.get("VIDEOWALK_RCONV_ALLOW32", "1") != "0"
    shape_ok = ((H == 8 and W == 8)
                or (allow16 and H == 16 and W == 16)
                or (allow32 and H == 32 and W == 32))
    # interior convs only (C == features): the channel-changing first convs
    # measured as full-step regressions even when winning in isolation
    return (shape_ok and C >= min_c and C == features
            and jax.default_backend() == "tpu")


def reflect_conv2d(x: jax.Array, conv, kernel: int, stride: int,
                   pad: int) -> jax.Array:
    """Reflect-padded conv via zero-SAME conv + additive ring corrections.

    Args:
      x: NHWC input.
      conv: callable ``conv(x, padding)`` sharing one kernel across calls
        (a ``PadConv`` instance): built-in zero padding for the main conv,
        VALID for the strips.
      kernel/stride/pad: torch-style square conv geometry.

    Falls back to plain reflect-pad + VALID when the input is too small for
    the band slices (test-fixture sizes) or VIDEOWALK_REFLECT_FUSE=never.
    """
    if pad == 0:
        return conv(x, "VALID")
    B, H, W, C = x.shape
    # Kernel routing needs the PadConv calling convention (REFLECT_KERNEL is
    # a PadConv mode); bare-function convs (oracle fixtures) skip it.
    features = getattr(conv, "features", None)
    if features is not None and rconv_kernel_routes(
            H, W, C, features, kernel, stride, pad):
        return conv(x, "REFLECT_KERNEL")
    fuse = _fuse_mode()
    if fuse == "dots" and kernel == 3 and stride == 1 and pad == 1 \
            and H >= 2 and W >= 2:
        return conv(x, "RING_DOTS")
    if fuse != "always" or pad + 1 > H or pad + 1 > W:
        return conv(reflect_pad_hw(x, pad, pad), "VALID")

    h_out, r_t, r_b, h_top, h_bot = _band_counts(H, kernel, stride, pad)
    w_out, c_l, c_r, w_left, w_right = _band_counts(W, kernel, stride, pad)

    # Main conv: zero padding through the conv op itself — no pad copy.
    y = conv(x, [(pad, pad), (pad, pad)])

    flip = jnp.flip
    deltas = []

    # --- top/bottom bands: P reflected rows x full padded width (corners
    # belong to these bands), interior rows of the strip are zero.
    top = bot = None
    if r_t:
        top = jnp.pad(reflect_pad_hw(flip(x[:, 1:pad + 1], 1), 0, pad),
                      ((0, 0), (0, h_top - pad), (0, 0), (0, 0)))
    if r_b:
        bot = jnp.pad(reflect_pad_hw(flip(x[:, H - pad - 1:H - 1], 1), 0, pad),
                      ((0, 0), (h_bot - pad, 0), (0, 0), (0, 0)))
    if top is not None and bot is not None and top.shape == bot.shape:
        d = conv(jnp.concatenate([top, bot], axis=0), "VALID")  # one conv
        deltas.append(_pad_to(d[:B], h_out, w_out, 0, 0))
        deltas.append(_pad_to(d[B:], h_out, w_out, h_out - r_b, 0))
    else:
        if top is not None:
            deltas.append(_pad_to(conv(top, "VALID"), h_out, w_out, 0, 0))
        if bot is not None:
            deltas.append(_pad_to(conv(bot, "VALID"), h_out, w_out,
                                  h_out - r_b, 0))

    # --- left/right bands: P reflected cols x interior rows only (rows
    # [P, H+P) of the padded frame — zero-padded rows top and bottom).
    left = right = None
    if c_l:
        left = jnp.pad(flip(x[:, :, 1:pad + 1], 2),
                       ((0, 0), (pad, pad), (0, w_left - pad), (0, 0)))
    if c_r:
        right = jnp.pad(flip(x[:, :, W - pad - 1:W - 1], 2),
                        ((0, 0), (pad, pad), (w_right - pad, 0), (0, 0)))
    if left is not None and right is not None and left.shape == right.shape:
        d = conv(jnp.concatenate([left, right], axis=0), "VALID")
        deltas.append(_pad_to(d[:B], h_out, w_out, 0, 0))
        deltas.append(_pad_to(d[B:], h_out, w_out, 0, w_out - c_r))
    else:
        if left is not None:
            deltas.append(_pad_to(conv(left, "VALID"), h_out, w_out, 0, 0))
        if right is not None:
            deltas.append(_pad_to(conv(right, "VALID"), h_out, w_out, 0,
                                  w_out - c_r))

    for d in deltas:
        y = y + d.astype(y.dtype)
    return y
