"""Label-propagation parity vs. a NumPy oracle of the reference evaluator
(code/test.py:141-160 + code/utils/test_utils.py:129-179)."""

import numpy as np
import pytest

import jax.numpy as jnp

from videowalk_tpu.eval import context_index_bank, propagate_labels


def reference_propagation_oracle(feats, labels0, n_context, long_mem, topk,
                                 temperature, radius):
    """Direct NumPy re-derivation of the reference's autoregressive loop."""
    N, C, H, W = feats.shape
    HW = H * W
    key_indices = context_index_bank(n_context, long_mem, N - n_context)

    # radius mask (code/test.py:118-123)
    gy, gx = np.mgrid[0:H, 0:W]
    D = np.sqrt((gy.ravel()[:, None] - gy.ravel()[None]) ** 2
                + (gx.ravel()[:, None] - gx.ravel()[None]) ** 2)
    mask = np.where(D < radius, 0.0, -1e10)

    lbls = labels0.reshape(N, HW, -1).copy()
    n_lbl = lbls.shape[-1]
    feats_flat = feats.reshape(N, C, HW)

    preds = []
    for t in range(key_indices.shape[0]):
        idx = key_indices[t]
        keys = feats_flat[idx]                       # (L, C, HW)
        query = feats_flat[t + n_context]            # (C, HW)
        A = np.einsum("lck,cq->lkq", keys, query)    # (L, HW_k, HW_q)
        A[len(long_mem):] += mask[None]
        A = A.reshape(-1, HW) / temperature          # (L*HW_k, HW_q)
        # topk over source nodes per query + softmax over the kept k
        ids = np.argsort(-A, axis=0)[:topk]          # (topk, HW_q)
        w = np.take_along_axis(A, ids, axis=0)
        w = np.exp(w - w.max(0, keepdims=True))
        w = w / w.sum(0, keepdims=True)
        ctx = lbls[idx].reshape(-1, n_lbl)           # (L*HW, n_lbl)
        pred = (ctx[ids] * w[..., None]).sum(0)      # (HW, n_lbl)
        if t == 0:
            pred = lbls[0]                            # code/test.py:158-159
        lbls[t + n_context] = pred
        preds.append(pred.reshape(H, W, n_lbl))
    return np.stack(preds)


@pytest.mark.parametrize("long_mem", [[0]])
def test_propagation_matches_reference_oracle(long_mem):
    rng = np.random.RandomState(0)
    n_context, N_targets, C, H, W, n_lbl = 3, 6, 8, 6, 6, 4
    N = N_targets + n_context
    feats = rng.randn(N, C, H, W).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    labels0 = np.zeros((N, H, W, n_lbl), np.float32)
    onehot = rng.randint(0, n_lbl, (H, W))
    labels0[:n_context + 1] = np.eye(n_lbl, dtype=np.float32)[onehot]

    oracle = reference_propagation_oracle(
        feats, labels0, n_context, long_mem, topk=5, temperature=0.07,
        radius=4.0)

    key_indices = context_index_bank(n_context, long_mem, N_targets)
    ours = np.asarray(propagate_labels(
        jnp.asarray(feats), jnp.asarray(labels0), jnp.asarray(key_indices),
        n_context=n_context, n_long=len(long_mem), topk=5,
        temperature=0.07, radius=4.0))

    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_context_index_bank_matches_reference_shape():
    """(N, 1 + n_context); long-mem col 0 then sliding window
    (code/utils/test_utils.py:129-145)."""
    ki = context_index_bank(3, [0], 5)
    assert ki.shape == (5, 4)
    np.testing.assert_array_equal(ki[:, 0], 0)
    np.testing.assert_array_equal(ki[0, 1:], [0, 1, 2])
    np.testing.assert_array_equal(ki[4, 1:], [4, 5, 6])


def test_context_index_bank_nonzero_long_mem():
    ki = context_index_bank(2, [0, 1], 4)
    assert ki.shape == (4, 4)
    # long-mem frame 1 (> 0): idx = 1 + n_context + 1 = 4, zeroed for the
    # first n_context + t + 1 targets (code/utils/test_utils.py:134-139)
    np.testing.assert_array_equal(ki[:, 1], [0, 0, 0, 0])


def test_bucketed_propagation_matches_unbucketed():
    """Shape-bucketed wrapper (compile-hygiene, VERDICT round-1 weak #2) is
    numerically identical to the exact-shape call on odd shapes."""
    from videowalk_tpu.eval.propagation import propagate_labels_bucketed

    rng = np.random.RandomState(3)
    n_context, N_targets, C, H, W, n_lbl = 3, 7, 8, 6, 5, 3  # all off-bucket
    N = N_targets + n_context
    feats = rng.randn(N, C, H, W).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    labels0 = np.zeros((N, H, W, n_lbl), np.float32)
    onehot = rng.randint(0, n_lbl, (H, W))
    labels0[:n_context + 1] = np.eye(n_lbl, dtype=np.float32)[onehot]
    key_indices = context_index_bank(n_context, [0], N_targets)

    kw = dict(n_context=n_context, n_long=1, topk=4, temperature=0.07,
              radius=4.0)
    exact = np.asarray(propagate_labels(
        jnp.asarray(feats), jnp.asarray(labels0), jnp.asarray(key_indices),
        **kw))
    bucketed = propagate_labels_bucketed(
        feats, labels0, key_indices, length_bucket=16, label_bucket=8, **kw)
    assert bucketed.shape == exact.shape
    np.testing.assert_allclose(bucketed, exact, rtol=1e-6, atol=1e-7)


def test_windowed_matches_blocked_selection():
    """topk_affinity_radius == topk_affinity_blocked whenever every query
    has >= topk in-radius candidates (the real eval regime)."""
    import jax.numpy as jnp

    from videowalk_tpu.eval.propagation import (
        _spatial_mask, topk_affinity_blocked, topk_affinity_radius)

    rng = np.random.RandomState(0)
    H, W, C, L, n_long, k = 9, 11, 16, 4, 1, 5
    HW = H * W
    q = rng.randn(C, HW).astype(np.float32)
    q /= np.linalg.norm(q, axis=0, keepdims=True)
    keys = rng.randn(L, C, HW).astype(np.float32)
    keys /= np.linalg.norm(keys, axis=1, keepdims=True)
    mask = _spatial_mask(H, W, radius=4.0)

    w_b, i_b = topk_affinity_blocked(jnp.asarray(q), jnp.asarray(keys),
                                     mask, 0.05, k, n_long)
    w_r, i_r = topk_affinity_radius(jnp.asarray(q), jnp.asarray(keys),
                                    0.05, k, n_long, 4.0, H, W)
    np.testing.assert_array_equal(np.asarray(i_b), np.asarray(i_r))
    np.testing.assert_allclose(np.asarray(w_b), np.asarray(w_r),
                               rtol=1e-6, atol=1e-7)


def test_propagate_windowed_backend_matches_xla():
    import jax.numpy as jnp

    from videowalk_tpu.eval.propagation import (context_index_bank,
                                                propagate_labels)

    rng = np.random.RandomState(1)
    n_context, n_t, C, H, W, n_lbl = 3, 5, 8, 8, 10, 3
    N = n_context + n_t
    feats = rng.randn(N, C, H, W).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    labels0 = rng.rand(N, H, W, n_lbl).astype(np.float32)
    ki = context_index_bank(n_context, [0], n_t)

    kw = dict(n_context=n_context, n_long=1, topk=4, temperature=0.05,
              radius=3.0)
    p_x = propagate_labels(jnp.asarray(feats), jnp.asarray(labels0),
                           jnp.asarray(ki), backend="xla", **kw)
    p_w = propagate_labels(jnp.asarray(feats), jnp.asarray(labels0),
                           jnp.asarray(ki), backend="windowed", **kw)
    np.testing.assert_allclose(np.asarray(p_x), np.asarray(p_w),
                               rtol=1e-5, atol=1e-6)


def test_tiled_backend_matches_xla():
    import jax.numpy as jnp

    from videowalk_tpu.eval.propagation import (context_index_bank,
                                                propagate_labels)

    rng = np.random.RandomState(3)
    n_context, n_t, C, H, W, n_lbl = 3, 5, 8, 9, 13, 3
    N = n_context + n_t
    feats = rng.randn(N, C, H, W).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    labels0 = rng.rand(N, H, W, n_lbl).astype(np.float32)
    ki = context_index_bank(n_context, [0], n_t)

    kw = dict(n_context=n_context, n_long=1, topk=4, temperature=0.05,
              radius=3.0)
    p_x = propagate_labels(jnp.asarray(feats), jnp.asarray(labels0),
                           jnp.asarray(ki), backend="xla", **kw)
    p_t = propagate_labels(jnp.asarray(feats), jnp.asarray(labels0),
                           jnp.asarray(ki), backend="tiled", **kw)
    np.testing.assert_allclose(np.asarray(p_x), np.asarray(p_t),
                               rtol=1e-5, atol=1e-6)


def test_tiled_affinity_matches_blocked_selection():
    """Exact id/weight parity at a shape where every query has >= topk
    in-radius candidates, incl. a non-multiple-of-8 grid."""
    import jax.numpy as jnp

    from videowalk_tpu.eval.propagation import (
        _spatial_mask, topk_affinity_blocked, topk_affinity_tiled)

    rng = np.random.RandomState(5)
    H, W, C, L, n_long, k = 10, 14, 16, 5, 2, 6
    HW = H * W
    q = rng.randn(C, HW).astype(np.float32)
    q /= np.linalg.norm(q, axis=0, keepdims=True)
    keys = rng.randn(L, C, HW).astype(np.float32)
    keys /= np.linalg.norm(keys, axis=1, keepdims=True)
    mask = _spatial_mask(H, W, radius=4.0)

    w_b, i_b = topk_affinity_blocked(jnp.asarray(q), jnp.asarray(keys),
                                     mask, 0.05, k, n_long)
    w_t, i_t = topk_affinity_tiled(jnp.asarray(q), jnp.asarray(keys),
                                   0.05, k, n_long, 4.0, H, W)
    # same selected source sets per query (ordering may differ on merges)
    for qi in range(HW):
        assert set(np.asarray(i_b)[:, qi]) == set(np.asarray(i_t)[:, qi]), qi
    np.testing.assert_allclose(np.sort(np.asarray(w_b), 0),
                               np.sort(np.asarray(w_t), 0),
                               rtol=1e-5, atol=1e-7)


def test_auto_topk_form_gates_single_tile_melt_shapes():
    """The sparse backend auto-picks the fori_loop top-k ONLY at degenerate
    single-tile grids with wide unrolled pass work (the measured Mosaic
    compile melt: 8x8 grid, K=10, R=12); real-size grids and narrow shapes
    keep the unroll default (None), and an explicit choice always wins."""
    from videowalk_tpu.eval.propagation import _auto_topk_form
    from videowalk_tpu.ops.prop_sparse_kernel import sparse_halo

    r12, r6 = sparse_halo(12.0, 8), sparse_halo(6.0, 8)
    # the melt shape: 8x8 grid (single tile), K10 R12
    assert _auto_topk_form(8, 8, 8, r12, 3, 1, 10) == "loop"
    # K5 / R6 variants measured fine -> stay on the default
    assert _auto_topk_form(8, 8, 8, r12, 3, 1, 5) is None
    assert _auto_topk_form(8, 8, 8, r6, 3, 1, 10) is None
    # same K/R at a 2x2-tile grid measured fine -> default
    assert _auto_topk_form(16, 16, 8, r12, 3, 1, 10) is None
    # real DAVIS-480p geometry is far from single-tile -> default
    assert _auto_topk_form(60, 107, 8, r12, 21, 1, 10) is None
    # intermediate geometries (ADVICE r4: the residual risk is UNTESTED
    # in-between shapes, not the gate itself):
    # 1xN strip grids: single tile along H only -> not single-tile, default
    assert _auto_topk_form(8, 16, 8, r12, 3, 1, 10) is None
    assert _auto_topk_form(16, 8, 8, r12, 3, 1, 10) is None
    # single-tile but JUST under the k*CW cost bound -> default
    assert _auto_topk_form(8, 8, 8, r6, 3, 1, 7) is None
    # deeper context widens CW past the bound even at K=5 -> loop
    assert _auto_topk_form(8, 8, 8, r12, 20, 3, 5) == "loop"
    # tile-16 single-tile melt scale (the measured tile-16 compile melt
    # needed the loop form too) -> loop
    r12_16 = sparse_halo(12.0, 16)
    assert _auto_topk_form(16, 16, 16, r12_16, 3, 1, 10) == "loop"
