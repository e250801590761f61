"""Block-sparse Pallas propagation kernel vs the XLA blocked backend
(interpret mode on the CPU test platform; the same kernel compiles on TPU —
selected with --prop-backend sparse)."""

import numpy as np
import pytest

import jax.numpy as jnp

from videowalk_tpu.eval import context_index_bank
from videowalk_tpu.eval.propagation import propagate_labels


def _setup(seed, n_context, N_targets, C, H, W, n_lbl):
    rng = np.random.RandomState(seed)
    N = N_targets + n_context
    feats = rng.randn(N, C, H, W).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    labels0 = np.zeros((N, H, W, n_lbl), np.float32)
    onehot = rng.randint(0, n_lbl, (H, W))
    labels0[: n_context + 1] = np.eye(n_lbl, dtype=np.float32)[onehot]
    return feats, labels0


@pytest.mark.parametrize("H,W,radius,topk", [
    (9, 12, 3.0, 5),    # off-tile shapes: query-grid padding + halo clip
    (8, 8, 6.0, 3),     # window covers the whole frame
    (16, 11, 4.0, 7),   # two tile rows
])
def test_sparse_matches_blocked(H, W, radius, topk):
    n_context, N_targets, C, n_lbl = 3, 5, 8, 4
    feats, labels0 = _setup(0, n_context, N_targets, C, H, W, n_lbl)
    key_indices = context_index_bank(n_context, [0], N_targets)
    kw = dict(n_context=n_context, n_long=1, topk=topk, temperature=0.07,
              radius=radius)
    want = np.asarray(propagate_labels(
        jnp.asarray(feats), jnp.asarray(labels0), jnp.asarray(key_indices),
        backend="xla", **kw))
    got = np.asarray(propagate_labels(
        jnp.asarray(feats), jnp.asarray(labels0), jnp.asarray(key_indices),
        backend="sparse_interpret", **kw))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sparse_matches_blocked_two_long_frames():
    """n_long=2 exercises the multi-long-row path and the index bank's
    delayed second anchor."""
    H, W = 9, 12
    n_context, N_targets, C, n_lbl = 2, 6, 8, 3
    feats, labels0 = _setup(1, n_context, N_targets, C, H, W, n_lbl)
    key_indices = context_index_bank(n_context, [0, 1], N_targets)
    kw = dict(n_context=n_context, n_long=2, topk=4, temperature=0.05,
              radius=3.0)
    want = np.asarray(propagate_labels(
        jnp.asarray(feats), jnp.asarray(labels0), jnp.asarray(key_indices),
        backend="xla", **kw))
    got = np.asarray(propagate_labels(
        jnp.asarray(feats), jnp.asarray(labels0), jnp.asarray(key_indices),
        backend="sparse_interpret", **kw))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_sparse_tile16_matches_blocked(monkeypatch):
    """VIDEOWALK_SPARSE_TILE=16 (experimental MXU-filling tile) through the
    sparse backend reproduces the XLA path (interpret mode).

    Slow tier (round-5 pruning policy, CLAUDE.md): tile 16 is a MEASURED
    LOSER at DAVIS 480p (21.0 vs 18.0 ms/target — the CW-wide VPU top-k
    sweeps grow with tile size faster than the matmuls fill; STATUS
    round-4 item 4); the knob stays for future hardware only. The loop
    top-k form it needs is separately load-bearing (the _auto_topk_form
    melt mitigation) and keeps its default-tier test below."""
    monkeypatch.setenv("VIDEOWALK_SPARSE_TILE", "16")
    H, W = 18, 21
    n_context, N_targets, C, n_lbl = 3, 5, 8, 4
    feats, labels0 = _setup(3, n_context, N_targets, C, H, W, n_lbl)
    key_indices = context_index_bank(n_context, [0], N_targets)
    kw = dict(n_context=n_context, n_long=1, topk=5, temperature=0.07,
              radius=4.0)
    want = np.asarray(propagate_labels(
        jnp.asarray(feats), jnp.asarray(labels0), jnp.asarray(key_indices),
        backend="xla", **kw))
    got = np.asarray(propagate_labels(
        jnp.asarray(feats), jnp.asarray(labels0), jnp.asarray(key_indices),
        backend="sparse_interpret", **kw))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sparse_supported_gate():
    """The compiled-kernel shape gate (used by --prop-backend auto on TPU):
    feature channels lane-aligned, labels within one 128-lane tile; any
    radius (the DMA halo self-aligns to the sublane tile)."""
    from videowalk_tpu.ops.prop_sparse_kernel import (sparse_halo,
                                                      sparse_supported)

    assert sparse_supported(256, 3, 12.0)      # DAVIS: r=12 -> WIN 32
    assert sparse_supported(1024, 20, 8.0)     # VIP-ish: WIN 24
    assert sparse_supported(256, 3, 5.0)       # odd radius: halo rounds up
    assert not sparse_supported(200, 3, 12.0)  # channels off the lane tile
    assert not sparse_supported(256, 129, 12.)  # labels past one lane tile
    assert not sparse_supported(256, 0, 12.0)   # no label channels
    # halo: smallest r >= floor(radius) with (tile + 2r) % 8 == 0
    assert sparse_halo(12.0, 8) == 12
    assert sparse_halo(5.0, 8) == 8
    assert sparse_halo(5.9, 16) == 8
    assert sparse_halo(4.0, 8) == 4


def test_sparse_odd_radius_matches_blocked():
    """Radii whose floor is not a multiple of 4 (sweep values like R=5/10)
    run through an over-padded DMA halo with the exact disk mask — parity
    with the XLA path must hold through the autoregressive scan."""
    H, W = 13, 10
    n_context, N_targets, C, n_lbl = 3, 5, 8, 4
    feats, labels0 = _setup(4, n_context, N_targets, C, H, W, n_lbl)
    key_indices = context_index_bank(n_context, [0], N_targets)
    for radius in (5.0, 2.0):
        kw = dict(n_context=n_context, n_long=1, topk=4, temperature=0.07,
                  radius=radius)
        want = np.asarray(propagate_labels(
            jnp.asarray(feats), jnp.asarray(labels0),
            jnp.asarray(key_indices), backend="xla", **kw))
        got = np.asarray(propagate_labels(
            jnp.asarray(feats), jnp.asarray(labels0),
            jnp.asarray(key_indices), backend="sparse_interpret", **kw))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sparse_first_target_is_ground_truth():
    """The reference quirk (code/test.py:156-160) survives the kernel path."""
    H, W = 8, 8
    n_context, N_targets, C, n_lbl = 3, 4, 8, 4
    feats, labels0 = _setup(2, n_context, N_targets, C, H, W, n_lbl)
    key_indices = context_index_bank(n_context, [0], N_targets)
    got = np.asarray(propagate_labels(
        jnp.asarray(feats), jnp.asarray(labels0), jnp.asarray(key_indices),
        backend="sparse_interpret", n_context=n_context, n_long=1, topk=3,
        temperature=0.07, radius=6.0))
    np.testing.assert_allclose(got[0], labels0[0], rtol=1e-6, atol=1e-7)


def test_loop_topk_matches_unrolled():
    """topk_form='loop' (fori_loop top-k lowering) is bitwise equal to the
    default unrolled form — same ops in the same order. Passed as the
    static arg (the env knob is trace-time, like VIDEOWALK_SPARSE_TILE)."""
    H, W = 16, 11
    n_context, N_targets, C, n_lbl = 3, 5, 8, 4
    feats, labels0 = _setup(5, n_context, N_targets, C, H, W, n_lbl)
    key_indices = context_index_bank(n_context, [0], N_targets)
    kw = dict(n_context=n_context, n_long=1, topk=6, temperature=0.07,
              radius=4.0)
    want = np.asarray(propagate_labels(
        jnp.asarray(feats), jnp.asarray(labels0), jnp.asarray(key_indices),
        backend="sparse_interpret", topk_form="unroll", **kw))
    got = np.asarray(propagate_labels(
        jnp.asarray(feats), jnp.asarray(labels0), jnp.asarray(key_indices),
        backend="sparse_interpret", topk_form="loop", **kw))
    np.testing.assert_array_equal(got, want)
