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


@partial(jax.jit, static_argnames=("n_context", "n_long", "topk",
                                   "temperature", "radius", "blocked",
                                   "backend"))
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

    Returns:
      ``(N_targets, H, W, L)`` predicted soft labels per target frame.
    """
    N, C, H, W = feats.shape
    HW = H * W
    n_lbl = labels0.shape[-1]
    fused = backend in ("fused", "fused_interpret")
    mask = None if fused else _spatial_mask(H, W, radius)
    feats_flat = feats.reshape(N, C, HW)
    lbl_buf = labels0.reshape(N, HW, n_lbl)

    def step(lbl_buf, idx_row):
        t_global = idx_row[-1] + 1  # target frame = last short-term ctx + 1
        keys = feats_flat[idx_row]                       # (L, C, HW)
        ctx_lbls = lbl_buf[idx_row]                      # (L, HW, n_lbl)
        query = jax.lax.dynamic_index_in_dim(
            feats_flat, t_global, axis=0, keepdims=False)  # (C, HW)
        if fused:
            from videowalk_tpu.ops.propagation_kernel import (
                fused_topk_affinity, padded_hw)

            weights, ids = fused_topk_affinity(
                query, keys, n_long=n_long, topk=topk,
                temperature=temperature, radius=radius, H=H, W=W,
                interpret=backend == "fused_interpret")  # (topk, HW)
            # the kernel's flat ids stride by the padded HW
            hwp = padded_hw(HW)
            flat_lbls = jnp.zeros((keys.shape[0] * hwp, n_lbl),
                                  ctx_lbls.dtype)
            flat_lbls = flat_lbls.reshape(-1, hwp, n_lbl).at[
                :, :HW].set(ctx_lbls).reshape(-1, n_lbl)
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
    if pt:
        key_indices = np.concatenate(
            [key_indices, np.repeat(key_indices[-1:], pt, axis=0)])
        feats = np.concatenate(
            [feats, np.zeros((pt, *feats.shape[1:]), feats.dtype)])
        labels0 = np.concatenate(
            [labels0, np.zeros((pt, *labels0.shape[1:]), labels0.dtype)])
    if pl:
        labels0 = np.concatenate(
            [labels0, np.zeros((*labels0.shape[:-1], pl), labels0.dtype)],
            axis=-1)

    preds = propagate_labels(
        jnp.asarray(feats), jnp.asarray(labels0), jnp.asarray(key_indices),
        n_context=n_context, n_long=n_long, topk=topk,
        temperature=temperature, radius=radius, blocked=blocked,
        backend=backend)
    return np.asarray(preds)[:n_targets, ..., :n_lbl]
