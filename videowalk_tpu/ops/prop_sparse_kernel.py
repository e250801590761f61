"""Pallas TPU kernel: block-sparse top-k label propagation (one fused pass).

The eval hot loop (reference ``code/utils/test_utils.py:148-179`` +
``code/test.py:145-160``) selects, per query cell, the top-k affinities over
``n_long`` unmasked context frames plus 20 radius-masked short-term frames,
softmaxes the k values, and mixes the source cells' labels. The round-2
"tiled" XLA backend (eval/propagation.py::topk_affinity_tiled) already cut
this to one ``lax.top_k`` per target, but it still

- computes the FULL (HW x HW) affinity for every context frame on the MXU
  even though the radius mask admits only a (2r+8)^2 window per 8x8 query
  tile (~6.5x wasted FLOPs at DAVIS 480p, r=12),
- writes ~600 MB of tiled candidate windows to HBM per target frame and
  reads them back for the top-k,
- pays ~5 ms for the ``lax.top_k`` call plus label gathers.

This kernel does the whole thing in one pass per 8x8 query tile, entirely
in VMEM: the halo window of each short-term frame is DMA'd from HBM
(keys stay in a zero-padded (N, H+2r, W+2r, C) layout so every window is a
static-size strided slice — no gathers), affinities are 21 small MXU
matmuls, the top-k is a destructive k-pass max/mask sweep over the VMEM
candidate row, and the label mixing folds into one sparse-weight matmul
(U @ labels, with U holding ``exp(a_j - a_max)`` at the k selected columns)
— so neither ``lax.top_k`` nor any XLA gather appears, and the only HBM
traffic is the key/label windows themselves (~2.3 GB/target vs ~7 GB dense).

Semantics match the tiled/blocked backends (torch.topk + softmax + weighted
label sum) whenever each query has >= topk in-radius candidates — always at
real eval shapes; ties resolve to the first (lowest flat index) candidate.

Tile-16 verdict (v5e, 2026-08-19, tools/time_prop.py at DAVIS 480p r=12,
same-process interleaved, 3 rounds): tile 8 unroll **18.0 ms/target** (the
default) vs tile 8 loop 20.6 vs tile 16 loop 21.0. The fori_loop top-k
lowering (``VIDEOWALK_SPARSE_TOPK=loop``) was built because tile 16's
unrolled Mosaic module (10 straight-line passes over a (256, CW~44k) f32
row) blew up the remote compile service (>18 min); the loop form compiles
in normal time but costs ~14% at tile 8, and tile 16 — 4x MXU row fill,
2.56x less halo amplification — still LOSES: the kernel is bound by the
CW-wide VPU top-k sweeps and halo DMA, not MXU occupancy, and CW per tile
GROWS with tile size ((16+2r)^2 windows), so the sweeps get wider faster
than the matmuls get fuller. Tile 8 + unroll stays the default; both knobs
stay parity-tested for future hardware.

Pinned by tests/test_prop_sparse_kernel.py against the XLA blocked backend,
in interpret mode on CPU and compiled on TPU.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 8          # default query tile side (see sparse_topk_propagate(tile=))
_NEG = -1e30    # "removed / invalid" candidate fill


def _align(n: int, m: int) -> int:
    return -(-n // m) * m


def _kernel(idx_ref,            # SMEM (L,) int32 context frame indices
            off_ref,            # SMEM (1,) int32 global padded row offset of
                                # this call's query band (0 single-device;
                                # d * band_rows under the shard_map path)
            q_ref,              # VMEM (tq, tq, C) query tile
            klong_ref,          # VMEM (n_long, HWLp, C) long-term keys
            llong_ref,          # VMEM (n_long, HWLp, nl) long-term labels
            feats_ref,          # ANY  (N, Hb, Wh, C) padded per-frame keys
                                # (band slice: rows [off, off + Hq + 2r) of
                                # the global padded layout)
            lbls_ref,           # ANY  (N, Hb, Wh, nl) padded label buffer
            o_ref,              # VMEM (tq*tq, nl) tile predictions
            cand_ref,           # scratch f32 (TQ2, CW); reused as U after
                                # the destructive top-k (saves a CW-wide buf)
            lab_ref,            # scratch f32 (CW, nl)
            kwin_ref,           # scratch f32 (2, WIN, WIN, C)
            lwin_ref,           # scratch f32 (2, WIN, WIN, nl)
            ksem, lsem,         # DMA semaphores (2,)
            *, H, W, lHh, lWh, r, n_long, n_short, topk, temperature, radius,
            ntw, precision, tq, loop_topk):
    C = q_ref.shape[-1]
    nl = o_ref.shape[-1]
    TQ2 = tq * tq
    WIN = tq + 2 * r
    WIN2 = WIN * WIN
    HWLp = klong_ref.shape[1]
    CW = cand_ref.shape[1]
    i = pl.program_id(0)
    ti = i // ntw
    tj = i % ntw
    inv_t = 1.0 / temperature

    q = q_ref[...].reshape(TQ2, C)

    # ---- long-term frames: full-frame candidates, bounds mask only
    # (the reference applies the radius mask to short-term frames only,
    # code/utils/test_utils.py:162)
    flat = jax.lax.broadcasted_iota(jnp.int32, (1, HWLp), 1)
    lrow = flat // lWh
    lcol = flat % lWh
    lmask = jnp.where((lrow >= r) & (lrow < r + H)
                      & (lcol >= r) & (lcol < r + W)
                      & (flat < lHh * lWh), 0.0, _NEG).astype(jnp.float32)
    for l in range(n_long):
        a = jax.lax.dot_general(
            q, klong_ref[l], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)                         # (TQ2, HWLp)
        cand_ref[:, l * HWLp:(l + 1) * HWLp] = a * inv_t + lmask
        lab_ref[l * HWLp:(l + 1) * HWLp, :] = llong_ref[l]

    # ---- short-term frames: halo windows, bounds + disk mask
    # query cell (qr, qc) sits at padded coords (ti*tq + r + qr, ...); window
    # cell (wr, wc) at (ti*tq + wr, ...). dy = wr - r - qr.
    # Built DIRECTLY in the (TQ2, WIN2) candidate layout via 2-D iotas +
    # div/rem: Mosaic rejects the 4-D (tq,tq,WIN,WIN)->(TQ2,WIN2) vector
    # reshape ("unsupported shape cast" — both tiled dims change), while
    # lane-preserving leading-dim collapses like (tq,tq,C)->(TQ2,C) lower
    # fine.
    p = jax.lax.broadcasted_iota(jnp.int32, (TQ2, WIN2), 0)
    s = jax.lax.broadcasted_iota(jnp.int32, (TQ2, WIN2), 1)
    qr = p // tq
    qc = p - qr * tq
    wr = s // WIN
    wc = s - wr * WIN
    dy = wr - r - qr
    dx = wc - r - qc
    krow = off_ref[0] + ti * tq + wr          # GLOBAL padded row coords
    kcol = tj * tq + wc                       # cols are never band-sliced
    ok = ((dy * dy + dx * dx).astype(jnp.float32) < radius * radius) \
        & (krow >= r) & (krow < r + H) & (kcol >= r) & (kcol < r + W)
    smask = jnp.where(ok, 0.0, _NEG).astype(jnp.float32)

    base = n_long * HWLp

    def start_dma(l, slot):
        fr = idx_ref[n_long + l]
        kd = pltpu.make_async_copy(
            feats_ref.at[fr, pl.ds(ti * tq, WIN), pl.ds(tj * tq, WIN), :],
            kwin_ref.at[slot], ksem.at[slot])
        ld = pltpu.make_async_copy(
            lbls_ref.at[fr, pl.ds(ti * tq, WIN), pl.ds(tj * tq, WIN), :],
            lwin_ref.at[slot], lsem.at[slot])
        kd.start()
        ld.start()
        return kd, ld

    start_dma(0, 0)
    for l in range(n_short):
        slot = l % 2
        if l + 1 < n_short:
            start_dma(l + 1, (l + 1) % 2)
        # wait on this slot's DMAs (reconstructed copy descriptors wait on
        # the same semaphores)
        pltpu.make_async_copy(
            feats_ref.at[idx_ref[n_long + l],
                         pl.ds(ti * tq, WIN), pl.ds(tj * tq, WIN), :],
            kwin_ref.at[slot], ksem.at[slot]).wait()
        pltpu.make_async_copy(
            lbls_ref.at[idx_ref[n_long + l],
                        pl.ds(ti * tq, WIN), pl.ds(tj * tq, WIN), :],
            lwin_ref.at[slot], lsem.at[slot]).wait()
        kw = kwin_ref[slot].reshape(WIN2, C)
        a = jax.lax.dot_general(
            q, kw, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)                          # (TQ2, WIN2)
        seg = base + l * WIN2
        cand_ref[:, seg:seg + WIN2] = a * inv_t + smask
        lab_ref[seg:seg + WIN2, :] = lwin_ref[slot].reshape(WIN2, nl)

    # fill any alignment tail: _NEG candidates can never win the max, and
    # the label rows must be defined (0 * uninitialized = NaN otherwise)
    if CW > base + n_short * WIN2:
        tail = CW - base - n_short * WIN2
        cand_ref[:, base + n_short * WIN2:] = jnp.full(
            (TQ2, tail), _NEG, jnp.float32)
        lab_ref[base + n_short * WIN2:, :] = jnp.zeros((tail, nl),
                                                       jnp.float32)

    # ---- destructive k-pass top-k + unnormalized-softmax sparse weights.
    # Selection first (cand is consumed pass by pass, only the k
    # (index, weight) column pairs are kept), then the sparse weight matrix
    # U is rebuilt IN cand_ref's buffer — U and the candidates never need
    # to coexist, which halves the kernel's CW-wide VMEM footprint (this is
    # what lets tile=16's 45 MB candidate row fit).
    col = jax.lax.broadcasted_iota(jnp.int32, (TQ2, CW), 1)
    if loop_topk:
        # fori_loop form: the unrolled form below lowers 2*topk full-width
        # (TQ2, CW) vector passes into the Mosaic module, which at tile 16
        # / DAVIS shapes (a 256 x 44032 f32 row, 10 passes) blows the
        # compile up (>18 min, melted the remote compile service —
        # STATUS round-4 roadmap). The loop form compiles one body per
        # loop; op-for-op identical arithmetic in identical order, so the
        # results are bitwise equal (pinned by tests/test_prop_sparse_kernel
        # ::test_loop_topk_matches_unrolled). Mosaic cannot lower
        # dynamic_update_slice/dynamic_slice inside a kernel fori_loop, so
        # the per-pass (first, e) columns are written/read via one-hot
        # masked selects over the tiny (TQ2, topk) carries — exact (adding
        # zeros / selecting one nonzero column is lossless in fp).
        colk = jax.lax.broadcasted_iota(jnp.int32, (TQ2, topk), 1)
        vmax = jnp.max(cand_ref[...], axis=1, keepdims=True)  # pass-0 max

        def select(j, carry):
            firsts, es, z = carry
            c = cand_ref[...]
            m = jnp.max(c, axis=1, keepdims=True)         # (TQ2, 1)
            hit = c >= m                                  # >=: exact max hit
            first = jnp.min(jnp.where(hit, col, CW), axis=1,
                            keepdims=True)                # first occurrence
            e = jnp.exp(m - vmax)                         # (TQ2, 1)
            cand_ref[...] = jnp.where(col == first, _NEG, c)
            sel = colk == j
            firsts = jnp.where(sel, first, firsts)
            es = jnp.where(sel, e, es)
            return firsts, es, z + e

        firsts, es, z = jax.lax.fori_loop(
            0, topk, select,
            (jnp.zeros((TQ2, topk), jnp.int32),
             jnp.zeros((TQ2, topk), jnp.float32),
             jnp.zeros((TQ2, 1), jnp.float32)))

        cand_ref[...] = jnp.zeros((TQ2, CW), jnp.float32)

        def rebuild(j, _):
            sel = colk == j
            first = jnp.sum(jnp.where(sel, firsts, 0), axis=1,
                            keepdims=True)
            e = jnp.sum(jnp.where(sel, es, 0.0), axis=1, keepdims=True)
            cand_ref[...] += jnp.where(col == first, e, 0.0)
            return 0

        jax.lax.fori_loop(0, topk, rebuild, 0)
    else:
        vmax = None
        z = jnp.zeros((TQ2, 1), jnp.float32)
        picks = []
        for j in range(topk):
            c = cand_ref[...]
            m = jnp.max(c, axis=1, keepdims=True)         # (TQ2, 1)
            hit = c >= m                                  # >=: exact max hit
            first = jnp.min(jnp.where(hit, col, CW), axis=1,
                            keepdims=True)                # first occurrence
            if j == 0:
                vmax = m
            e = jnp.exp(m - vmax)                         # (TQ2, 1)
            picks.append((first, e))
            z += e
            cand_ref[...] = jnp.where(col == first, _NEG, c)
        for j, (first, e) in enumerate(picks):
            term = jnp.where(col == first, e, 0.0)
            if j == 0:
                cand_ref[...] = term
            else:
                cand_ref[...] += term

    pred = jax.lax.dot_general(
        cand_ref[...], lab_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)                              # (TQ2, nl)
    o_ref[...] = pred / z


def sparse_band_propagate(qg, feats_band, lbl_band, klong, llong, idx_row, row_off,
                 *, H, W, lHh, lWh, n_long, topk, temperature, radius,
                 interpret, precision, tq, topk_form=None):
    """The pallas_call, band-capable. ``qg`` is a tile-aligned (Hq, Wp, C)
    query grid; ``feats_band``/``lbl_band`` hold rows
    [row_off, row_off + Hq + 2r) of the global padded layout (the full
    layout when ``row_off`` is 0 and Hq covers the whole grid). ``H``/``W``
    are the GLOBAL valid extents (bounds masks), ``lHh``/``lWh`` the global
    padded dims of ``klong``'s raster rows. Returns (Hq, Wp, nl) raster
    predictions for the band.
    """
    Hq, Wp, C = qg.shape
    nl = lbl_band.shape[-1]
    r = sparse_halo(radius, tq)
    WIN = tq + 2 * r
    n_short = int(idx_row.shape[0]) - n_long
    nth, ntw = Hq // tq, Wp // tq
    R = nth * ntw * tq * tq
    HWLp = klong.shape[1]
    CW = _align(n_long * HWLp + n_short * WIN * WIN, 128)

    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[precision]
    kernel = functools.partial(
        _kernel, H=H, W=W, lHh=lHh, lWh=lWh, r=r, n_long=n_long,
        n_short=n_short, topk=topk, temperature=float(temperature),
        radius=float(radius), ntw=ntw, precision=prec, tq=tq,
        loop_topk=_resolve_topk_form(topk_form) == "loop")

    out = pl.pallas_call(
        kernel,
        grid=(nth * ntw,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # idx_row
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # row_off
            pl.BlockSpec((tq, tq, C), lambda i: (i // ntw, i % ntw, 0),
                         memory_space=pltpu.VMEM),                 # query
            pl.BlockSpec((n_long, HWLp, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),                 # klong
            pl.BlockSpec((n_long, HWLp, nl), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),                 # llong
            pl.BlockSpec(memory_space=pl.ANY),                  # feats
            pl.BlockSpec(memory_space=pl.ANY),                  # labels
        ],
        out_specs=pl.BlockSpec((tq * tq, nl), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, nl), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tq * tq, CW), jnp.float32),                # cand/U
            pltpu.VMEM((CW, nl), jnp.float32),                     # labels
            pltpu.VMEM((2, WIN, WIN, C), jnp.float32),             # key win
            pltpu.VMEM((2, WIN, WIN, nl), jnp.float32),            # lbl win
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(idx_row, jnp.int32),
      jnp.asarray(row_off, jnp.int32).reshape(1),
      qg, klong, llong, feats_band, lbl_band)

    # tiled row order -> band raster order (pure reshape/transpose —
    # identical values to a gather by the tile permutation)
    return (out.reshape(nth, ntw, tq, tq, nl)
            .transpose(0, 2, 1, 3, 4)
            .reshape(Hq, Wp, nl))


@functools.partial(
    jax.jit,
    static_argnames=("n_long", "topk", "temperature", "radius", "H", "W",
                     "interpret", "precision", "tile", "topk_form"))
def sparse_topk_propagate(query, feats_pad, lbl_pad, klong, llong, idx_row,
                          *, n_long, topk, temperature, radius, H, W,
                          interpret=False, precision="highest", tile=TQ,
                          topk_form=None):
    """One target frame's label predictions, fused in VMEM.

    Args:
      query: (C, HW) target-frame features (L2-normalized).
      feats_pad: (N, H+2r, W+2r, C) zero-padded per-frame features.
      lbl_pad: (N, H+2r, W+2r, nl) zero-padded label buffer (the scan carry).
      klong: (n_long, HWLp, C) long-term keys, rows = padded (Hh*Wh) raster
        of the long frames (zero rows beyond Hh*Wh), HWLp 128-aligned.
      llong: (n_long, HWLp, nl) the matching label rows.
      idx_row: (n_long + n_short,) int32 context frame indices (the
        short-term tail indexes feats_pad / lbl_pad).
      tile: query tile side. 8 = default; 16 quadruples the affinity
        matmuls' M (fills the MXU's 128 rows) and cuts halo read
        amplification 2.56x, at a 4x-wider candidate scratch — viable only
        because U is rebuilt in the candidate buffer (see _kernel).
    Returns:
      (HW, nl) predicted soft labels, raster order.
    """
    tq = int(tile)
    C, HW = query.shape
    assert HW == H * W
    N, Hh, Wh, _ = feats_pad.shape
    r = sparse_halo(radius, tq)
    assert Hh == _align(H, tq) + 2 * r and Wh == _align(W, tq) + 2 * r, \
        "feats_pad must come from pad_for_sparse with the same tile"
    nl = lbl_pad.shape[-1]
    nth, ntw = -(-H // tq), -(-W // tq)
    Hp, Wp = nth * tq, ntw * tq

    # query -> (Hp, Wp, C), zero-padded
    qg = jnp.moveaxis(query.reshape(C, H, W), 0, -1)
    qg = jnp.pad(qg, ((0, Hp - H), (0, Wp - W), (0, 0)))

    # The XLA backends pin Precision.HIGHEST on every affinity einsum
    # (eval/propagation.py); the kernel defaults to the same so its top-k
    # selections agree (default MXU precision truncates f32 affinities to
    # bf16, which flips near-tie selections and drifts the autoregressive
    # scan — measured max-label divergence 0.095 over 48 DAVIS-480p frames).
    # "high" (3-pass) is a cheaper near-f32 option exposed for sweeps.
    grid = sparse_band_propagate(
        qg, feats_pad, lbl_pad, klong, llong, idx_row,
        jnp.zeros((1,), jnp.int32),
        H=H, W=W, lHh=Hh, lWh=Wh, n_long=n_long, topk=topk,
        temperature=temperature, radius=radius, interpret=interpret,
        precision=precision, tq=tq, topk_form=topk_form)  # (Hp, Wp, nl)
    return grid[:H, :W].reshape(HW, nl)


def sparse_topk_form() -> str:
    """Trace-time top-k lowering form, ``VIDEOWALK_SPARSE_TOPK``.

    ``unroll`` (default) emits the k passes as straight-line vector code;
    ``loop`` emits two ``fori_loop``s (bitwise-identical results — see
    _kernel). The loop form exists because the unrolled Mosaic module's
    compile time scales with k * CW and melts the compile service at
    tile 16 / DAVIS shapes; measure both on your hardware before flipping.
    Like ``sparse_tile``, callers inside jit must resolve this eagerly and
    pass it as a static arg (``propagate_labels(topk_form=...)``).
    """
    import os

    return _resolve_topk_form(os.environ.get("VIDEOWALK_SPARSE_TOPK",
                                             "unroll"))


def _resolve_topk_form(form: str | None) -> str:
    form = form or sparse_topk_form()
    if form not in ("unroll", "loop"):
        raise ValueError(
            f"sparse top-k form {form!r} must be 'unroll' or 'loop' "
            f"(VIDEOWALK_SPARSE_TOPK / topk_form)")
    return form


def sparse_tile() -> int:
    """The query tile side from ``VIDEOWALK_SPARSE_TILE`` (default 8),
    validated once here — the single authority every caller (the CLI's
    auto gate, the sparse driver, sparse_supported) resolves through, so
    the gate and the launched kernel can never disagree on the tile.

    Constraints: positive multiple of 8 (the tile and its halo window are
    sublane-dim HBM DMA slices). 8 = measured default; 16 = experimental
    MXU-filling variant (see sparse_topk_propagate)."""
    import os

    raw = os.environ.get("VIDEOWALK_SPARSE_TILE", str(TQ))
    try:
        tile = int(raw)
    except ValueError:
        raise ValueError(
            f"VIDEOWALK_SPARSE_TILE={raw!r} is not an integer") from None
    if tile <= 0 or tile % 8:
        raise ValueError(
            f"VIDEOWALK_SPARSE_TILE={tile} must be a positive multiple of 8 "
            f"(sublane-dim DMA slices)")
    return tile


def sparse_shard_count(H: int, tile: int, n_devices: int) -> int:
    """ACTIVE band count for sharded sparse propagation at height ``H`` on
    an ``n_devices`` mesh: each device takes ``ceil(tile_rows / D)`` tile
    rows (the layouts zero-extend so uneven splits stay exact — trailing
    bands are masked dead and dropped), so the number of devices doing
    real work is ``ceil(rows / ceil(rows / D))``. DAVIS-480p (H=60,
    tile=8): 8 rows -> all 8 devices of a v5e-8; JHMDB 320px (H=40):
    5 rows -> 5 of 8."""
    nth = -(-H // tile)
    D = max(1, int(n_devices))
    per_band = -(-nth // D)
    return -(-nth // per_band)


def sparse_halo(radius: float, tile: int) -> int:
    """DMA halo width for a given mask radius: the smallest
    ``r >= floor(radius)`` whose window ``tile + 2r`` is a multiple of the
    8-row sublane tile (Mosaic HBM slices). ``tile`` must itself be a
    multiple of 8 (enforced here and by ``sparse_tile``), which reduces the
    condition to ``r % 4 == 0`` — the extra ring of cells lands outside the
    exact disk mask (``_kernel`` masks with the TRUE ``radius``), so any
    radius keeps exact semantics; odd radii just DMA a slightly wider
    window (e.g. r=5 -> halo 8, 24x24 vs 18x18)."""
    if tile <= 0 or tile % 8:
        raise ValueError(f"tile={tile} must be a positive multiple of 8")
    return _align(max(int(np.floor(radius)), 0), 4)


def sparse_supported(C: int, n_lbl: int, radius: float) -> bool:
    """Shape gate for the compiled TPU kernel (interpret mode has no such
    limits): feature channels ride the lane dim of the key DMA (must be
    128-aligned — true for every encoder in the factory: 256/512/1024),
    and labels pad to one 128-lane tile. Any radius works — the DMA halo
    rounds itself up to sublane alignment (``sparse_halo``); ``radius`` is
    kept in the signature so the gate stays the single call the CLI makes."""
    del radius
    try:
        sparse_tile()
    except ValueError:
        return False
    return C % 128 == 0 and 1 <= n_lbl <= 128


def pad_for_sparse(feats: jax.Array, radius: float, H: int, W: int,
                   tile: int = TQ) -> jax.Array:
    """(N, C, HW) features -> zero-padded key layout.

    Rows/cols span ``r`` halo + the tile-aligned query grid + ``r`` halo
    (``r = sparse_halo(radius, tile)``), so the window of the LAST
    (possibly partial) tile row/column is still an in-bounds static slice:
    (N, r + ceil(H/tile)*tile + r, same for W, C).
    """
    r = sparse_halo(radius, tile)
    N, C, HW = feats.shape
    Hp, Wp = _align(H, tile), _align(W, tile)
    x = jnp.moveaxis(feats.reshape(N, C, H, W), 1, -1)
    return jnp.pad(x, ((0, 0), (r, r + Hp - H), (r, r + Wp - W), (0, 0)))


def long_rows_for_sparse(feats_pad: jax.Array, lbl_pad: jax.Array,
                         long_idx, rows: int | None = None
                         ) -> tuple[jax.Array, jax.Array]:
    """Long-term key/label rows in the kernel's (HWLp, ...) layout.

    ``rows`` restricts the raster to the first ``rows`` padded rows — the
    sharded path passes the pre-extension row count so the candidate width
    (and with it the exact reduction tree of the kernel's final
    ``U @ labels`` matmul) is identical to the single-device layout,
    keeping sharded-vs-single parity bitwise rather than 1-ULP.
    """
    N, Hh, Wh, C = feats_pad.shape
    if rows is None:
        rows = Hh
    nl = lbl_pad.shape[-1]
    HWLp = _align(rows * Wh, 128)
    k = feats_pad[jnp.asarray(long_idx)][:, :rows].reshape(
        len(long_idx), rows * Wh, C)
    l = lbl_pad[jnp.asarray(long_idx)][:, :rows].reshape(
        len(long_idx), rows * Wh, nl)
    pad = HWLp - rows * Wh
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        l = jnp.pad(l, ((0, 0), (0, pad), (0, 0)))
    return k, l
