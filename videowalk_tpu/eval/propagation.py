"""On-device autoregressive k-NN label propagation.

Parity surface with the reference evaluator:

- ``context_index_bank``  <-> code/utils/test_utils.py:129-145 (long-term
  frame-0 anchors + sliding short-term window of ``n_context`` frames).
- ``topk_affinity``       <-> code/utils/test_utils.py:148-179
  (mem_efficient_batched_affinity): key/query dot products + radius mask +
  temperature + top-k over source nodes + softmax over the kept k.
- ``propagate_labels``    <-> code/test.py:141-160: for each target frame,
  predicted soft labels = weighted sum of top-k context labels; predictions
  are fed back into the label buffer (autoregressive).

TPU-first re-design: the reference's double-minibatched einsum loop with CPU
offload becomes a single ``lax.scan`` over target frames — the affinity for
one target frame is one MXU matmul (C x [ctx*HW keys] x [HW queries]); the
label buffer lives in HBM as scan carry; ``jax.lax.top_k`` replaces
torch.topk. No host round-trips inside the loop.
"""

from __future__ import annotations

import os

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from videowalk_tpu.core.masks import radius_mask


def context_index_bank(n_context: int, long_mem: list[int], N: int) -> np.ndarray:
    """Source-frame indices for each of N target frames.

    Returns ``(N, L + n_context)`` int32 — for target t (0-based among
    targets), columns are the long-term anchors then the short-term window
    ``[t, t+1, ..., t+n_context-1]`` in the 0-padded global frame indexing
    (targets start at global index ``n_context``).

    Reference: code/utils/test_utils.py:129-145.
    """
    ll = []
    for t in long_mem:
        assert 0 <= t < N, "context frame out of bounds"
        idx = np.zeros((N, 1), np.int64)
        if t > 0:
            idx += t + (n_context + 1)
            idx[: n_context + t + 1] = 0
        ll.append(idx)
    ss = (np.arange(n_context)[None].repeat(N, 0)
          + np.arange(N)[:, None])
    return np.concatenate(ll + [ss], axis=-1).astype(np.int32)


def _spatial_mask(H: int, W: int, radius: float) -> jnp.ndarray:
    """(HW, HW) additive mask: 0 inside radius, -1e10 outside
    (code/test.py:118-123)."""
    D = radius_mask(H, W, radius).reshape(H * W, H * W)
    return jnp.where(D > 0, 0.0, -1e10).astype(jnp.float32)


def topk_affinity(query: jax.Array, keys: jax.Array, mask: jax.Array,
                  temperature: float, topk: int, n_long: int
                  ) -> tuple[jax.Array, jax.Array]:
    """Top-k softmax affinities between one target frame and its context.

    Args:
      query: ``(C, HW)`` target-frame features (L2-normalized).
      keys: ``(L, C, HW)`` context-frame features (L long-mem frames first).
      mask: ``(HW, HW)`` additive radius mask (applied to short-term frames
        only, like the reference: code/utils/test_utils.py:162).
      temperature, topk: reference --temperature / --topk.
      n_long: number of long-term frames (mask not applied to them).

    Returns:
      (weights, indices): ``(topk, HW)`` softmax weights over the selected
      source nodes and their flat indices into ``(L * HW)``.
    """
    L, C, HW = keys.shape
    # query-major layout so top_k needs no transposed copy of the ~GB-scale
    # affinity (measured 2x on 480p shapes)
    A = jnp.einsum("lck,cq->qlk", keys, query,
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)   # (HW_q, L, HW_k)
    if n_long < L:
        A = A.at[:, n_long:].add(mask.T[:, None, :])
    A = A.reshape(HW, L * HW) / temperature
    weights, ids = jax.lax.top_k(A, topk)                # (HW_q, topk)
    weights = jax.nn.softmax(weights, axis=-1)
    return weights.T, ids.T                               # (topk, HW_q)


def topk_affinity_blocked(query: jax.Array, keys: jax.Array,
                          mask: jax.Array, temperature: float, topk: int,
                          n_long: int) -> tuple[jax.Array, jax.Array]:
    """Memory-efficient top-k affinity: stream over context frames.

    Equivalent to ``topk_affinity`` but never materializes the full
    ``(L*HW, HW)`` affinity — a running per-query top-k is carried through a
    ``lax.scan`` over the L context frames, so the transient is one
    ``(HW, HW)`` block. At DAVIS 480p (HW ~6.4k, L=21) this is ~20x less
    HBM than the one-shot path (3.4 GB -> 165 MB per frame).

    This is the TPU re-design of the reference's double-minibatched
    ``mem_efficient_batched_affinity`` (code/utils/test_utils.py:148-179),
    whose motivation was exactly this memory blow-up.
    """
    L, C, HW = keys.shape

    def step(carry, inputs):
        best_w, best_i = carry                 # (HW_q, topk) running top-k
        l_idx, key_l = inputs
        A = jnp.einsum("ck,cq->kq", key_l, query,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)  # (HW_k, HW_q)
        A = jnp.where(l_idx >= n_long, A + mask, A)
        A = A.T / temperature                  # (HW_q, HW_k)
        w_l, i_l = jax.lax.top_k(A, topk)      # block top-k
        i_l = i_l + l_idx * HW                 # flat source index
        cat_w = jnp.concatenate([best_w, w_l], axis=-1)   # (HW_q, 2k)
        cat_i = jnp.concatenate([best_i, i_l], axis=-1)
        best_w, sel = jax.lax.top_k(cat_w, topk)
        best_i = jnp.take_along_axis(cat_i, sel, axis=-1)
        return (best_w, best_i), None

    init = (jnp.full((HW, topk), -jnp.inf, jnp.float32),
            jnp.zeros((HW, topk), jnp.int32))
    (w, i), _ = jax.lax.scan(step, init,
                             (jnp.arange(L), keys))
    w = jax.nn.softmax(w, axis=-1)
    return w.T, i.T                             # (topk, HW_q)


def topk_affinity_radius(query: jax.Array, keys: jax.Array,
                         temperature: float, topk: int,
                         n_long: int, radius: float, H: int, W: int
                         ) -> tuple[jax.Array, jax.Array]:
    """Radius-windowed top-k affinity: candidates gathered per query.

    The radius mask admits only sources within Euclidean distance
    ``radius`` of the query cell — a ``(2r+1)^2`` window (~625 of 6420
    candidates at DAVIS 480p, r=12). The blocked path still runs
    ``lax.top_k`` over all HW candidates per context frame, and that top-k
    — not the affinity matmul (~0.5 ms on the MXU) — dominates eval time.
    Here the full ``(HW_q, HW_k)`` affinity block is still computed on the
    MXU (cheap), then each query's window is *gathered* into a dense
    ``(HW_q, (2r+1)^2)`` array with two ``take_along_axis`` passes
    (row-window, then column-window) and top-k runs over the window only.

    Long-term frames (the first ``n_long``) are unmasked in the reference
    (code/utils/test_utils.py:162 applies the mask to short-term frames
    only), so they keep the full-candidate top-k.

    Selection is identical to the blocked path whenever each query has at
    least ``topk`` in-radius candidates (always, at real eval shapes);
    with fewer, both paths fall back to -1e10-masked entries whose softmax
    weight is ~0 but whose values differ in the masked tail.

    Returns the same contract as ``topk_affinity_blocked``: ``(topk, HW)``
    softmax weights and flat indices into ``(L * HW)``.
    """
    L, C, HW = keys.shape
    r_int = int(np.floor(radius))
    wsz = 2 * r_int + 1
    offs = np.arange(-r_int, r_int + 1)
    # static per-offset radius validity (Euclidean dist < radius, matching
    # core/masks.radius_mask)
    disk = (offs[:, None] ** 2 + offs[None, :] ** 2) < radius ** 2
    idx_h = np.clip(np.arange(H)[:, None] + offs[None], 0, H - 1)  # (H,wsz)
    idx_w = np.clip(np.arange(W)[:, None] + offs[None], 0, W - 1)
    ok_h = (np.arange(H)[:, None] + offs[None] >= 0) & (
        np.arange(H)[:, None] + offs[None] < H)
    ok_w = (np.arange(W)[:, None] + offs[None] >= 0) & (
        np.arange(W)[:, None] + offs[None] < W)
    valid = (ok_h[:, None, :, None] & ok_w[None, :, None, :]
             & disk[None, None, :, :])                     # (H,W,wsz,wsz)
    add = jnp.asarray(np.where(valid, 0.0, -1e10), jnp.float32)
    # flat source index per (query, offset) — same arithmetic as the mask
    flat_ids = jnp.asarray(
        idx_h[:, None, :, None] * W + idx_w[None, :, None, :],
        jnp.int32).reshape(HW, wsz * wsz)
    jidx_h = jnp.asarray(idx_h)
    jidx_w = jnp.asarray(idx_w)

    def window_topk(key_l, l_idx):
        A = jnp.einsum("ck,cq->qk", key_l, query,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)  # (HW_q, HW_k)
        A4 = A.reshape(H, W, H, W)
        B = jnp.take_along_axis(A4, jidx_h[:, None, :, None], axis=2)
        B = jnp.take_along_axis(B, jidx_w[None, :, None, :], axis=3)
        B = (B + add).reshape(HW, wsz * wsz) / temperature
        w_l, sel = jax.lax.top_k(B, topk)                  # (HW_q, topk)
        i_l = jnp.take_along_axis(flat_ids, sel, axis=-1) + l_idx * HW
        return w_l, i_l

    def full_topk(key_l, l_idx):
        A = jnp.einsum("ck,cq->qk", key_l, query,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32) / temperature
        w_l, i_l = jax.lax.top_k(A, topk)
        return w_l, i_l + l_idx * HW

    best_w = jnp.full((HW, topk), -jnp.inf, jnp.float32)
    best_i = jnp.zeros((HW, topk), jnp.int32)

    def merge(carry, new):
        bw, bi = carry
        w_l, i_l = new
        cat_w = jnp.concatenate([bw, w_l], axis=-1)
        cat_i = jnp.concatenate([bi, i_l], axis=-1)
        bw, sel = jax.lax.top_k(cat_w, topk)
        bi = jnp.take_along_axis(cat_i, sel, axis=-1)
        return (bw, bi)

    for l in range(n_long):                      # typically 1 frame
        best_w, best_i = merge((best_w, best_i), full_topk(keys[l], l))

    def step(carry, inputs):
        l_idx, key_l = inputs
        return merge(carry, window_topk(key_l, l_idx)), None

    (best_w, best_i), _ = jax.lax.scan(
        step, (best_w, best_i),
        (jnp.arange(n_long, L), keys[n_long:]))
    w = jax.nn.softmax(best_w, axis=-1)
    return w.T, best_i.T                          # (topk, HW_q)


def topk_affinity_tiled(query: jax.Array, keys: jax.Array,
                        temperature: float, topk: int, n_long: int,
                        radius: float, H: int, W: int
                        ) -> tuple[jax.Array, jax.Array]:
    """Single-top_k radius affinity via static query-tile windows.

    Measured on v5e at DAVIS 480p shapes: ``lax.top_k`` costs ~4.7 ms per
    CALL nearly independent of candidate width ((6420,6420)->10 takes
    5.2 ms, (7168,1024)->10 takes 4.7 ms). The blocked path pays that fixed
    cost 42x per target frame (a block top-k plus a running merge for each
    of 21 context frames) — ~250 of its 320 ms/frame. This path pays it
    ONCE.

    Structure: queries are tiled 8x8; with radius r, every query in a tile
    draws its admissible candidates from one static (8+2r)^2 window of the
    key grid — a *slice* (TPU-fast), not a gather (TPU-slow; the gather
    variant measured 2.0 fps vs 3.1 blocked). Per context frame the full
    affinity block is one MXU matmul (~1 ms), sliced into per-tile windows;
    all frames' windows plus the unmasked long-term frames' full rows are
    concatenated per query and a SINGLE ``lax.top_k`` selects over
    ``n_long*HW + n_short*(8+2r)^2`` candidates.

    Selection matches ``topk_affinity_blocked`` whenever each query has at
    least ``topk`` in-radius candidates (always at eval shapes); ties and
    the sub-top_k masked tail can differ (softmax weight ~0 either way).

    Returns ``(topk, HW)`` softmax weights + flat indices into ``(L*HW)``.
    """
    L, C, HW = keys.shape
    TQ = 8
    r_int = int(np.floor(radius))
    WIN = TQ + 2 * r_int
    nth, ntw = -(-H // TQ), -(-W // TQ)
    Hp, Wp = nth * TQ, ntw * TQ
    TQ2, WIN2 = TQ * TQ, WIN * WIN
    R = nth * ntw * TQ2
    n_short = L - n_long

    # static disk mask over (query-in-tile, window-cell) offsets:
    # dy = wr - r - qr, dx = wc - r - qc; admissible iff dist < radius
    qr = np.arange(TQ)
    wr = np.arange(WIN)
    dy = wr[None, :] - r_int - qr[:, None]            # (TQ, WIN)
    dd = dy[:, None, :, None] ** 2 + dy[None, :, None, :] ** 2
    disk_add = jnp.asarray(
        np.where(dd < radius ** 2, 0.0, -1e10).astype(np.float32)
        .reshape(1, TQ2, WIN2))

    # static flat source ids per (tile, query-in-tile is irrelevant, window
    # cell): key_row = ti*TQ - r + wr, key_col = tj*TQ - r + wc
    ids = np.empty((nth, ntw, WIN2), np.int32)
    for ti in range(nth):
        for tj in range(ntw):
            kr = np.clip(ti * TQ - r_int + wr, 0, H - 1)
            kc = np.clip(tj * TQ - r_int + wr, 0, W - 1)
            ids[ti, tj] = (kr[:, None] * W + kc[None, :]).reshape(-1)
    ids_static = jnp.asarray(
        np.broadcast_to(ids.reshape(nth * ntw, 1, WIN2),
                        (nth * ntw, TQ2, WIN2)).reshape(R, WIN2))

    # raster <- tiled query-row permutation
    hq, wq = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    perm = ((hq // TQ) * ntw + wq // TQ) * TQ2 + (hq % TQ) * TQ + wq % TQ
    perm = jnp.asarray(perm.reshape(-1))              # (HW,)

    def tiles_of(A):
        """(HW_q, HW_k) affinity -> (R, WIN2) masked per-tile windows."""
        A4 = A.reshape(H, W, H, W)
        A4 = jnp.pad(A4, ((0, Hp - H), (0, Wp - W),
                          (r_int, r_int + Hp - H), (r_int, r_int + Wp - W)),
                     constant_values=-1e10)
        rows = []
        for ti in range(nth):
            cols = []
            for tj in range(ntw):
                blk = A4[ti * TQ:(ti + 1) * TQ, tj * TQ:(tj + 1) * TQ,
                         ti * TQ:ti * TQ + WIN, tj * TQ:tj * TQ + WIN]
                cols.append(blk.reshape(TQ2, WIN2))
            rows.append(jnp.stack(cols))
        T = jnp.concatenate(rows).reshape(nth * ntw, TQ2, WIN2)
        return (T + disk_add).reshape(R, WIN2)

    def q_affinity(key_l):
        return jnp.einsum("ck,cq->qk", key_l, query,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)

    def short_step(_, key_l):
        return None, tiles_of(q_affinity(key_l))

    _, short_tiles = jax.lax.scan(short_step, None, keys[n_long:])
    # (n_short, R, WIN2) -> (R, n_short*WIN2)
    short_tiles = jnp.transpose(short_tiles, (1, 0, 2)).reshape(R, -1)

    longs = []
    for l in range(n_long):
        A = q_affinity(keys[l])                        # (HW_q, HW_k)
        A = jnp.pad(A.reshape(H, W, HW),
                    ((0, Hp - H), (0, Wp - W), (0, 0)))
        A = A.reshape(nth, TQ, ntw, TQ, HW).transpose(0, 2, 1, 3, 4)
        longs.append(A.reshape(R, HW))
    cand = jnp.concatenate(longs + [short_tiles], axis=-1) / temperature

    w, sel = jax.lax.top_k(cand, topk)                 # ONE top_k call
    # map selected candidate columns to flat (L*HW) source ids
    off = n_long * HW
    is_long = sel < off
    long_flat = sel                                    # frame*HW + src
    s = sel - off
    frame_s = s // WIN2
    w_i = s % WIN2
    short_flat = (jnp.take_along_axis(
        ids_static, jnp.clip(w_i, 0, WIN2 - 1), axis=-1)
        + (frame_s + n_long) * HW)
    flat = jnp.where(is_long, long_flat, short_flat)   # (R, topk)

    w = jax.nn.softmax(w, axis=-1)
    w = w[perm]                                        # raster query order
    flat = flat[perm]
    return w.T, flat.T                                 # (topk, HW)


BACKENDS = ("xla", "tiled", "windowed", "sparse", "sparse_interpret")


@partial(jax.jit, static_argnames=("n_context", "n_long", "topk",
                                   "temperature", "radius", "blocked",
                                   "backend", "tile", "topk_form", "mesh",
                                   "data_axis"))
def propagate_labels(
    feats: jax.Array,
    labels0: jax.Array,
    key_indices: jax.Array,
    *,
    n_context: int,
    n_long: int,
    topk: int,
    temperature: float,
    radius: float,
    blocked: bool = True,
    backend: str = "xla",
    tile: int | None = None,
    topk_form: str | None = None,
    mesh=None,
    data_axis: str = "data",
) -> jax.Array:
    """Autoregressive label propagation over a whole video, on device.

    Args:
      feats: ``(N_total, C, H, W)`` per-frame features, L2-normalized over C.
        Frame indexing matches the reference's 0-padded videos: the first
        ``n_context`` entries are copies of frame 0 (code/data/vos.py:148-156).
      labels0: ``(N_total, H, W, L)`` soft label maps; entries at and after
        ``n_context`` are ignored (they get overwritten by predictions, like
        code/test.py:142 zeroing).
      key_indices: ``(N_targets, n_long + n_context)`` from
        ``context_index_bank``.
      tile: sparse-backend query tile side; None resolves
        ``VIDEOWALK_SPARSE_TILE`` AT TRACE TIME — this function is jitted
        and ``tile`` is part of the cache key, so callers sweeping tiles in
        one process must pass it explicitly (``propagate_labels_bucketed``
        does).
      topk_form: sparse-backend top-k lowering, 'unroll' | 'loop'; None
        resolves ``VIDEOWALK_SPARSE_TOPK`` at trace time (same jit-cache
        caveat as ``tile``).
      mesh: optional ``jax.sharding.Mesh`` — sparse-family backends shard
        each step's query grid over ``mesh.shape[data_axis]`` devices (see
        ``_propagate_labels_sparse``); other backends reject it.

    Returns:
      ``(N_targets, H, W, L)`` predicted soft labels per target frame.
    """
    if backend not in BACKENDS:
        raise ValueError(f"unknown propagation backend {backend!r} "
                         f"(choose from {BACKENDS})")
    N, C, H, W = feats.shape
    HW = H * W
    n_lbl = labels0.shape[-1]
    if mesh is not None and data_axis not in mesh.shape:
        raise ValueError(
            f"mesh has no axis {data_axis!r} (axes: {tuple(mesh.shape)})")
    if backend in ("sparse", "sparse_interpret"):
        return _propagate_labels_sparse(
            feats, labels0, key_indices, n_context=n_context,
            n_long=n_long, topk=topk, temperature=temperature,
            radius=radius, interpret=backend == "sparse_interpret",
            tile=tile, topk_form=topk_form, mesh=mesh, data_axis=data_axis)
    if mesh is not None and mesh.shape[data_axis] > 1:
        raise ValueError(
            f"multi-device propagation is only implemented for the sparse "
            f"backends (got backend={backend!r})")
    # only the blocked/plain xla paths consume the dense (HW, HW) mask;
    # tiled/windowed slice radius windows directly (building it anyway cost
    # ~165 MB of device constant at DAVIS 480p shapes)
    mask = (None if backend in ("windowed", "tiled")
            else _spatial_mask(H, W, radius))
    feats_flat = feats.reshape(N, C, HW)
    lbl_buf = labels0.reshape(N, HW, n_lbl)

    def step(lbl_buf, idx_row):
        t_global = idx_row[-1] + 1  # target frame = last short-term ctx + 1
        keys = feats_flat[idx_row]                       # (L, C, HW)
        ctx_lbls = lbl_buf[idx_row]                      # (L, HW, n_lbl)
        query = jax.lax.dynamic_index_in_dim(
            feats_flat, t_global, axis=0, keepdims=False)  # (C, HW)
        if backend == "tiled":
            weights, ids = topk_affinity_tiled(
                query, keys, temperature, topk, n_long, radius, H, W)
            flat_lbls = ctx_lbls.reshape(-1, n_lbl)      # (L*HW, n_lbl)
        elif backend == "windowed":
            weights, ids = topk_affinity_radius(
                query, keys, temperature, topk, n_long, radius, H, W)
            flat_lbls = ctx_lbls.reshape(-1, n_lbl)      # (L*HW, n_lbl)
        else:
            affinity_fn = topk_affinity_blocked if blocked else topk_affinity
            weights, ids = affinity_fn(query, keys, mask, temperature, topk,
                                       n_long)           # (topk, HW)
            flat_lbls = ctx_lbls.reshape(-1, n_lbl)      # (L*HW, n_lbl)
        picked = flat_lbls[ids]                          # (topk, HW, n_lbl)
        pred = jnp.sum(picked * weights[..., None], axis=0)  # (HW, n_lbl)
        # Reference quirk (code/test.py:156-160): the FIRST target's
        # prediction is replaced by the ground-truth frame-0 labels, both in
        # the buffer and in the output.
        pred = jnp.where(t_global == n_context, lbl_buf[0], pred)
        lbl_buf = jax.lax.dynamic_update_index_in_dim(
            lbl_buf, pred, t_global, axis=0)
        return lbl_buf, pred

    _, preds = jax.lax.scan(step, lbl_buf, key_indices)
    return preds.reshape(-1, H, W, n_lbl)


def _auto_topk_form(H: int, W: int, tile: int, r: int, n_context: int,
                    n_long: int, topk: int) -> str | None:
    """Sparse-backend top-k lowering when neither the ``topk_form`` arg nor
    ``VIDEOWALK_SPARSE_TOPK`` chose one.

    Degenerate single-tile query grids (H, W <= tile — synthetic /
    fast-test geometries, never real DAVIS/JHMDB) melt Mosaic's compile of
    the UNROLLED top-k when the pass work k * CW is wide: measured on v5e
    through the remote compile service (2026-08-19, 8x8 grid, C=256):
    K=10 R=12 (k*CW=32k) took 278-1556 s to first execution; K=5 R=12
    (16k) and K=10 R=6 (13k) took seconds; the same K=10 R=12 program at a
    2x2-tile grid took seconds. The fori_loop form compiles the melt case
    in 82-213 s (bitwise-equal results), so auto-pick it exactly there;
    full-size grids keep the ~14%-faster unroll (None = resolve the env
    default downstream).
    """
    win = tile + 2 * r
    cw = n_long * (-(-(H * W) // 128) * 128) + n_context * win * win
    if H <= tile and W <= tile and topk * cw >= 24000:
        return "loop"
    return None


def _propagate_labels_sparse(feats, labels0, key_indices, *, n_context,
                             n_long, topk, temperature, radius, interpret,
                             tile=None, topk_form=None, mesh=None,
                             data_axis="data"):
    """``propagate_labels`` via the block-sparse Pallas kernel
    (ops/prop_sparse_kernel.py): keys and the label buffer live in a
    zero-padded (N, H+2r, W+2r, .) halo layout so the kernel's per-tile
    windows are static strided slices; the scan carries the padded buffer.

    With ``mesh``, each target's query grid is sharded over the mesh's
    ``data_axis`` in horizontal bands of tile rows (``shard_map``): every
    device runs the kernel on its own band against the replicated
    key/label buffers (the band's halo rows come from a dynamic row slice,
    so no halo exchange is needed), and the per-step prediction is
    re-assembled across devices by XLA when the replicated scan carry is
    updated — the only per-step collective is that (HW, n_lbl) all-gather.
    The scan itself stays sequential (autoregressive label dependency);
    sharding lives inside each step. Any mesh size works with any
    geometry: each device takes ``ceil(tile_rows / D)`` tile rows, and
    uneven splits zero-extend the layouts so trailing bands are masked
    dead and dropped (``sparse_shard_count`` reports how many devices do
    real work)."""
    from videowalk_tpu.ops.prop_sparse_kernel import (sparse_band_propagate,
                                                      long_rows_for_sparse,
                                                      pad_for_sparse,
                                                      sparse_halo,
                                                      sparse_topk_propagate)

    N, C, H, W = feats.shape
    HW = H * W
    n_lbl = labels0.shape[-1]
    # Query tile side: 16 quadruples the affinity matmuls' M (fills the
    # MXU's 128 rows) and cuts halo read amplification 2.56x, at a 4x-wider
    # candidate scratch; 8 is the measured default. sparse_tile() is the
    # single validated authority for the env knob.
    if tile is None:
        from videowalk_tpu.ops.prop_sparse_kernel import sparse_tile

        tile = sparse_tile()
    # DMA halo (>= floor(radius), sublane-aligned); the kernel's disk mask
    # uses the exact radius, so odd radii stay exact.
    r = sparse_halo(radius, tile)
    if topk_form is None and not os.environ.get("VIDEOWALK_SPARSE_TOPK"):
        topk_form = _auto_topk_form(H, W, tile, r, n_context, n_long, topk)
    feats_pad = pad_for_sparse(feats.reshape(N, C, HW), radius, H, W,
                               tile=tile)
    # same halo + tile-grid padding as the keys (kernel window slices).
    # The channel (label) dim is padded to one full lane tile (128): Mosaic
    # can only DMA HBM slices whose lane dim is 128-aligned, and n_lbl sits
    # on lanes in the (N, Hh, Wh, nl) layout. Zero label channels are inert
    # through the kernel's label mixing; they are sliced off at the end.
    NLP = 128
    _, Hh, Wh, _ = feats_pad.shape
    lbl_pad = jnp.pad(labels0.reshape(N, H, W, n_lbl),
                      ((0, 0), (r, Hh - H - r), (r, Wh - W - r),
                       (0, NLP - n_lbl)))

    from jax.sharding import NamedSharding, PartitionSpec as P

    D = 1 if mesh is None else int(mesh.shape[data_axis])
    Hp = -(-H // tile) * tile
    Wp = -(-W // tile) * tile
    # Band height: every device takes ceil(tile_rows / D) tile rows, so ANY
    # geometry shards on ANY mesh size — when D does not divide the row
    # count, the padded layouts are zero-extended below the grid so the
    # trailing bands slice real (all-zero) rows; their windows fail the
    # kernel's GLOBAL bounds mask (krow < r + H), every candidate is _NEG,
    # and the garbage predictions land beyond row H where grid[:H] drops
    # them. Devices past the last band duplicate dead work instead of
    # desynchronizing the collective.
    Hb = -(-(Hp // tile) // D) * tile if D > 1 else Hp
    ext = D * Hb - Hp
    if ext:
        feats_pad = jnp.pad(feats_pad, ((0, 0), (0, ext), (0, 0), (0, 0)))
        lbl_pad = jnp.pad(lbl_pad, ((0, 0), (0, ext), (0, 0), (0, 0)))

    def step(lbl_pad, idx_row):
        t_global = idx_row[-1] + 1
        fr = jax.lax.dynamic_index_in_dim(feats_pad, t_global, 0,
                                          keepdims=False)
        # long rows use the PRE-extension raster (rows=Hh) so the candidate
        # width — and the final matmul's reduction tree — matches the
        # single-device layout bit for bit
        klong, llong = long_rows_for_sparse(feats_pad, lbl_pad,
                                            idx_row[:n_long], rows=Hh)
        if D == 1:
            query = jnp.moveaxis(fr[r:r + H, r:r + W], -1, 0).reshape(C, HW)
            pred = sparse_topk_propagate(
                query, feats_pad, lbl_pad, klong, llong, idx_row,
                n_long=n_long, topk=topk, temperature=temperature,
                radius=radius, H=H, W=W, interpret=interpret,
                tile=tile, topk_form=topk_form)             # (HW, NLP)
        else:
            # (D*Hb, Wp, C) band-aligned query grid (zeros past row Hp)
            qg = fr[r:r + D * Hb, r:r + Wp]

            def body(qg_band, idx_b, feats_b, lbl_b, klong_b, llong_b):
                off = jax.lax.axis_index(data_axis).astype(jnp.int32) * Hb
                fband = jax.lax.dynamic_slice_in_dim(
                    feats_b, off, Hb + 2 * r, axis=1)
                lband = jax.lax.dynamic_slice_in_dim(
                    lbl_b, off, Hb + 2 * r, axis=1)
                return sparse_band_propagate(
                    qg_band, fband, lband, klong_b, llong_b, idx_b,
                    off.reshape(1), H=H, W=W, lHh=Hh, lWh=Wh,
                    n_long=n_long, topk=topk, temperature=temperature,
                    radius=radius, interpret=interpret,
                    precision="highest", tq=tile,
                    topk_form=topk_form)                    # (Hb, Wp, NLP)

            grid = jax.shard_map(
                body, mesh=mesh,
                in_specs=(P(data_axis), P(), P(), P(), P(), P()),
                out_specs=P(data_axis), check_vma=False,
            )(qg, idx_row, feats_pad, lbl_pad, klong, llong)  # (D*Hb,Wp,NLP)
            pred = grid[:H, :W].reshape(HW, NLP)
        # Reference quirk (code/test.py:156-160): the FIRST target's
        # prediction is replaced by the ground-truth frame-0 labels.
        gt0 = lbl_pad[0, r:r + H, r:r + W].reshape(HW, NLP)
        pred = jnp.where(t_global == n_context, gt0, pred)
        lbl_pad = jax.lax.dynamic_update_slice(
            lbl_pad, pred.reshape(1, H, W, NLP)
            .astype(lbl_pad.dtype),
            (t_global, jnp.int32(r), jnp.int32(r), jnp.int32(0)))
        if D > 1:
            # keep the scan carry replicated: the sharded band prediction
            # forces exactly one (HW, NLP) all-gather here per step
            lbl_pad = jax.lax.with_sharding_constraint(
                lbl_pad, NamedSharding(mesh, P()))
        return lbl_pad, pred

    _, preds = jax.lax.scan(step, lbl_pad, key_indices)
    return preds.reshape(-1, H, W, NLP)[..., :n_lbl]


def propagate_labels_bucketed(
    feats: np.ndarray,
    labels0: np.ndarray,
    key_indices: np.ndarray,
    *,
    n_context: int,
    n_long: int,
    topk: int,
    temperature: float,
    radius: float,
    blocked: bool = True,
    backend: str = "xla",
    length_bucket: int = 16,
    label_bucket: int = 8,
    mesh=None,
    data_axis: str = "data",
) -> np.ndarray:
    """``propagate_labels`` with shape bucketing: O(1) compiles per sweep.

    ``propagate_labels`` is jitted over the video's exact shapes, so a real
    DAVIS/JHMDB sweep (``--cropSize -1``: native sizes, varying lengths,
    varying object counts) would recompile per video — minutes each through
    a remote TPU tunnel. This wrapper pads to shape buckets so distinct
    compilations are bounded by #resolutions x #length-buckets:

    - target count padded to a multiple of ``length_bucket`` by repeating the
      last ``key_indices`` row — re-running a target row is *idempotent* (its
      context indices all precede the write slot, so the recomputed
      prediction and buffer write are identical);
    - frame count padded with zero frames that no padded row ever reads
      (targets stop at the last real frame);
    - label-class count padded with zero channels to a multiple of
      ``label_bucket`` (predictions are per-channel weighted sums, so padded
      channels stay exactly zero and are sliced off).

    Numerics are exactly those of the unpadded call. See VERDICT.md round-1
    weak #2 (per-video recompilation).
    """
    n_targets, n_total = key_indices.shape[0], feats.shape[0]
    assert n_total == n_targets + n_context, (n_total, n_targets, n_context)
    n_lbl = labels0.shape[-1]

    def _round_up(n, m):
        return ((n + m - 1) // m) * m

    pt = _round_up(n_targets, length_bucket) - n_targets
    pl = _round_up(n_lbl, label_bucket) - n_lbl
    # Padding runs in jnp so device-resident feats stay on device: a 60-frame
    # 480p video's features are ~400 MB — fetching them to numpy and
    # re-uploading the padded copy costs ~10 s through the dev tunnel and
    # dominated eval wall time (round-2 measurement); key_indices is tiny and
    # stays numpy.
    if pt:
        key_indices = np.concatenate(
            [key_indices, np.repeat(key_indices[-1:], pt, axis=0)])
        feats = jnp.concatenate(
            [jnp.asarray(feats),
             jnp.zeros((pt, *feats.shape[1:]), feats.dtype)])
        labels0 = jnp.concatenate(
            [jnp.asarray(labels0),
             jnp.zeros((pt, *labels0.shape[1:]), labels0.dtype)])
    if pl:
        labels0 = jnp.concatenate(
            [jnp.asarray(labels0),
             jnp.zeros((*labels0.shape[:-1], pl), labels0.dtype)], axis=-1)

    # Resolve the sparse tile and top-k form EAGERLY so they are part of
    # propagate_labels' jit cache key (resolved inside the trace, an env
    # change after the first trace would be silently ignored).
    tile = topk_form = None
    if backend in ("sparse", "sparse_interpret"):
        from videowalk_tpu.ops.prop_sparse_kernel import (sparse_tile,
                                                          sparse_topk_form)

        tile = sparse_tile()
        topk_form = sparse_topk_form()
    preds = propagate_labels(
        jnp.asarray(feats), jnp.asarray(labels0), jnp.asarray(key_indices),
        n_context=n_context, n_long=n_long, topk=topk,
        temperature=temperature, radius=radius, blocked=blocked,
        backend=backend, tile=tile, topk_form=topk_form, mesh=mesh,
        data_axis=data_axis)
    # Slice the bucket padding off ON DEVICE before the host fetch: the
    # padded stack is 2.1x the real bytes at DAVIS geometry (labels 4->8,
    # targets 60->64), and the prediction fetch dominates the per-video
    # fixed cost through a remote tunnel (430 ms of a 552 ms fixed cost
    # for 13.1 MB — tools/decompose_prop_gap.py, round 5). Exact: padded
    # channels are identically zero and padded target rows idempotent.
    return np.asarray(preds[:n_targets, ..., :n_lbl])
