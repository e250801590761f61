"""Fused Pallas top-k affinity kernel for label propagation.

STATUS (round 2, honest measurement): this kernel is numerically correct
and kept under test, but it is NOT the production fast path. Fetch-synced
timing on v5e showed it at parity with the XLA blocked path (~70 ms/target
at DAVIS 480p) — the interim figures that showed it far ahead were timed
with ``jax.block_until_ready``, which is a no-op through the dev tunnel.
The production default is ``topk_affinity_tiled`` (eval/propagation.py):
one ``lax.top_k`` call per target over static radius windows, 42 ms/target
(``lax.top_k`` costs ~4.7 ms per CALL nearly independent of width, so call
count — not candidate count — is what matters).

The eval hot loop (reference code/utils/test_utils.py:148-179, re-designed in
videowalk_tpu/eval/propagation.py) computes, per target frame, the top-k
softmax affinities between every query node and ~L*HW context nodes. The XLA
path materializes per-frame (HW, HW) affinity blocks in HBM and runs
``jax.lax.top_k`` over them.

This kernel fuses the whole per-target-frame affinity pipeline on-chip:

- grid ``(L, key_chunks, query_tiles)``: each context frame's key chunk
  ``(C, KC)`` is pipelined into VMEM once and reused across all query tiles
  (the affinity matrix never exists in HBM);
- the radius mask is *computed in-kernel* from the flat node index (the XLA
  path adds a precomputed (HW, HW) mask — memory that never needs to exist);
- a streaming top-k (k iterative max passes over the VMEM affinity tile)
  merges each chunk's candidates into a running per-query top-k carried in
  VMEM scratch across the grid;
- at the last chunk of the last frame the kept-k weights are softmaxed
  in-kernel and written out.

Numerics match ``topk_affinity_blocked`` (same mask, same temperature
ordering, same softmax-over-kept-k). Tie-breaking among exactly-equal
affinities may order ids differently, which leaves the propagated labels
unchanged (the weighted label sum is over the same value multiset).

Source ids use the HWp-padded flat convention ``l * HWp + j``
(``HWp = round_up(HW, chunk)``); the label gather in eval/propagation.py
pads the label buffer to HWp to match.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # padded-lane / consumed-candidate fill
QT = 128     # queries per tile (MXU sublane-aligned)
# Key chunk width: ~1 MB of f32 keys at C=256 per pipelined block — small
# enough that radius locality skips most (query tile, chunk) pairs outright
# (a QT query tile spans ~QT/W grid rows; only chunks within ±radius rows
# can contain admissible keys).
KC_LANES = 1024


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _coords(flat: jax.Array, W: int) -> tuple[jax.Array, jax.Array]:
    """(row, col) of flat grid indices, exact in f32 for flat < 2^23."""
    f = flat.astype(jnp.float32)
    # floor((2*flat + 1) / (2W)) == flat // W exactly: the argument is never
    # integral (odd/even) and sits >= 1/(2W) away from any integer, far
    # beyond f32 rounding error at these magnitudes.
    y = jnp.floor((2.0 * f + 1.0) / (2.0 * W))
    x = f - y * W
    return y, x


def _row_max_argmax(a: jax.Array, lane: jax.Array
                    ) -> tuple[jax.Array, jax.Array]:
    """Per-row max and (first) argmax, all 2-D. a, lane: (QT, KC)."""
    m = jnp.max(a, axis=1, keepdims=True)                    # (QT, 1)
    big = jnp.int32(1 << 30)
    am = jnp.min(jnp.where(a == m, lane, big), axis=1,
                 keepdims=True)                              # (QT, 1)
    return m, am


def _kernel(q_ref, k_ref, w_out, i_out, best_w, best_i, a_ref, *,
            L: int, n_kc: int, n_long: int, topk: int, HWp: int, HW: int,
            KC: int, W: int, radius: float, temperature: float):
    l = pl.program_id(0)
    kc = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when(jnp.logical_and(l == 0, kc == 0))
    def _init():
        best_w[:, pl.ds(qi * QT, QT)] = jnp.full((topk, QT), NEG, jnp.float32)
        best_i[:, pl.ds(qi * QT, QT)] = jnp.zeros((topk, QT), jnp.int32)

    # Radius-locality chunk skip: a QT query tile spans grid rows
    # [qr0, qr1]; only key chunks whose row span intersects [qr0 - r,
    # qr1 + r] can contain admissible keys for a short-term frame, and
    # fully-padded chunks (beyond HW) never can. Skipped programs do no
    # matmul and no merge (their key DMA still streams, which is cheap).
    r_int = int(math.ceil(radius))
    qr0, qr1 = (qi * QT) // W, (qi * QT + QT - 1) // W
    kr0, kr1 = (kc * KC) // W, (kc * KC + KC - 1) // W
    overlap = jnp.logical_and(kr0 <= qr1 + r_int, kr1 >= qr0 - r_int)
    active = jnp.logical_and(
        jnp.logical_or(l < n_long, overlap), kc * KC < HW)

    @pl.when(active)
    def _work():
        # Affinity tile on the MXU: (QT, C) x (C, KC). HIGHEST precision to
        # match the XLA path's einsum (parity of top-k selections).
        a = jax.lax.dot_general(
            q_ref[:], k_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)              # (QT, KC)

        # Radius mask from grid coordinates (reference code/test.py:118-123:
        # additive -1e10 outside the disk, short-term frames only; padded
        # key lanes are always excluded).
        qf = qi * QT + jax.lax.broadcasted_iota(jnp.int32, (QT, 1), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (QT, KC), 1)
        kf = kc * KC + lane
        qy, qx = _coords(qf, W)
        ky, kx = _coords(kf, W)
        dy, dx = qy - ky, qx - kx
        inside = dy * dy + dx * dx < radius * radius
        a = jnp.where(jnp.logical_or(l < n_long, inside), a, a - 1e10)
        a = jnp.where(kf < HW, a / temperature, NEG)
        a_ref[:] = a

        # This chunk's top-k: k consuming max passes over the VMEM tile.
        cw = []
        ci = []
        for _ in range(topk):
            m, am = _row_max_argmax(a_ref[:], lane)
            cw.append(m)
            ci.append(l * HWp + kc * KC + am)
            a_ref[:] = jnp.where(lane == am, NEG, a_ref[:])
        chunk_w = jnp.concatenate(cw, axis=1)                # (QT, topk)
        chunk_i = jnp.concatenate(ci, axis=1).astype(jnp.int32)

        # Merge with the running top-k (tiny: 2k candidates per query).
        prev_w = best_w[:, pl.ds(qi * QT, QT)].T             # (QT, topk)
        prev_i = best_i[:, pl.ds(qi * QT, QT)].T
        ext_w = jnp.concatenate([prev_w, chunk_w], axis=1)   # (QT, 2k)
        ext_i = jnp.concatenate([prev_i, chunk_i], axis=1)
        ext_lane = jax.lax.broadcasted_iota(jnp.int32, ext_w.shape, 1)
        nw = []
        ni = []
        for _ in range(topk):
            m, am = _row_max_argmax(ext_w, ext_lane)
            sel = ext_lane == am
            nw.append(m)
            ni.append(jnp.sum(jnp.where(sel, ext_i, 0), axis=1,
                              keepdims=True))
            ext_w = jnp.where(sel, NEG, ext_w)
        best_w[:, pl.ds(qi * QT, QT)] = jnp.concatenate(nw, axis=1).T
        best_i[:, pl.ds(qi * QT, QT)] = jnp.concatenate(
            ni, axis=1).astype(jnp.int32).T

    # Emit from the running-best scratch (runs even on skipped programs so
    # out blocks, which are write-only, are always fully written).
    bw = best_w[:, pl.ds(qi * QT, QT)]                       # (topk, QT)
    bi = best_i[:, pl.ds(qi * QT, QT)]
    last = jnp.logical_and(l == L - 1, kc == n_kc - 1)

    @pl.when(last)
    def _emit():
        w = bw - jnp.max(bw, axis=0, keepdims=True)
        e = jnp.exp(w)
        w_out[:] = e / jnp.sum(e, axis=0, keepdims=True)
        i_out[:] = bi

    @pl.when(jnp.logical_not(last))
    def _keep():
        w_out[:] = bw
        i_out[:] = bi


def padded_hw(HW: int) -> int:
    """The padded key length / flat-id stride the kernel uses for HW."""
    return (_round_up(HW, KC_LANES) if HW > KC_LANES
            else _round_up(HW, QT))


@functools.partial(jax.jit, static_argnames=(
    "n_long", "topk", "temperature", "radius", "H", "W", "interpret"))
def fused_topk_affinity(query: jax.Array, keys: jax.Array, *, n_long: int,
                        topk: int, temperature: float, radius: float,
                        H: int, W: int, interpret: bool = False
                        ) -> tuple[jax.Array, jax.Array]:
    """Top-k softmax affinities for one target frame, fused on-chip.

    Args:
      query: ``(C, HW)`` L2-normalized target-frame features.
      keys: ``(L, C, HW)`` context-frame features (long-mem frames first).

    Returns:
      ``(weights, ids)``: ``(topk, HW)`` softmax weights over the kept k and
      flat source ids in the padded ``l * HWp + j`` convention
      (``HWp = padded_hw(HW)``).
    """
    L, C, HW = keys.shape
    if HW != H * W:
        raise ValueError(f"HW {HW} != H*W {H * W}")
    HWp = padded_hw(HW)
    KC = min(KC_LANES, HWp)
    n_kc = HWp // KC

    qp = jnp.zeros((HWp, C), jnp.float32).at[:HW].set(query.T)
    kp = jnp.zeros((L, C, HWp), jnp.float32).at[:, :, :HW].set(keys)

    kern = functools.partial(
        _kernel, L=L, n_kc=n_kc, n_long=n_long, topk=topk, HWp=HWp, HW=HW,
        KC=KC, W=W, radius=float(radius), temperature=float(temperature))

    w, i = pl.pallas_call(
        kern,
        grid=(L, n_kc, HWp // QT),
        in_specs=[
            pl.BlockSpec((QT, C), lambda l, kc, q: (q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, KC), lambda l, kc, q: (l, 0, kc),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((topk, QT), lambda l, kc, q: (0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((topk, QT), lambda l, kc, q: (0, q),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((topk, HWp), jnp.float32),
            jax.ShapeDtypeStruct((topk, HWp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((topk, HWp), jnp.float32),   # running best weights
            pltpu.VMEM((topk, HWp), jnp.int32),     # running best ids
            pltpu.VMEM((QT, KC), jnp.float32),      # consumable affinity tile
        ],
        interpret=interpret,
    )(qp, kp)
    return w[:, :HW], i[:, :HW]
