"""Sharded sparse label propagation (shard_map over query-tile bands) vs
the single-device sparse path, on the 8-device virtual CPU mesh.

The reference evaluates on one GPU (code/test.py); multi-device propagation
is a TPU-native extension: each step's query grid splits into horizontal
bands of tile rows, every device runs the block-sparse kernel on its band
against the replicated key/label buffers, and the scan carry stays
replicated via one (HW, n_lbl) all-gather per step. Numerics are bitwise
those of the single-device kernel: splitting the affinity matmuls' M (query
rows) changes no per-row dot product, and the per-row top-k is independent.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from videowalk_tpu.eval import context_index_bank
from videowalk_tpu.eval.propagation import propagate_labels
from videowalk_tpu.ops.prop_sparse_kernel import sparse_shard_count
from videowalk_tpu.parallel import make_mesh


def _setup(seed, n_context, N_targets, C, H, W, n_lbl):
    rng = np.random.RandomState(seed)
    N = N_targets + n_context
    feats = rng.randn(N, C, H, W).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    labels0 = np.zeros((N, H, W, n_lbl), np.float32)
    onehot = rng.randint(0, n_lbl, (H, W))
    labels0[: n_context + 1] = np.eye(n_lbl, dtype=np.float32)[onehot]
    return feats, labels0


@pytest.mark.parametrize("H,W,n_dev", [
    (32, 12, 4),    # 4 tile rows over 4 devices, off-tile width
    (16, 16, 2),    # 2 tile rows over 2 devices
    (61, 10, 8),    # ceil(61/8)=8 tile rows over the full mesh; last band
                    # holds the partial query row (valid-H bounds masking)
])
def test_sharded_sparse_matches_single_device(H, W, n_dev):
    n_context, N_targets, C, n_lbl = 3, 5, 8, 4
    feats, labels0 = _setup(0, n_context, N_targets, C, H, W, n_lbl)
    key_indices = context_index_bank(n_context, [0], N_targets)
    kw = dict(n_context=n_context, n_long=1, topk=4, temperature=0.07,
              radius=3.0, backend="sparse_interpret")
    want = np.asarray(propagate_labels(
        jnp.asarray(feats), jnp.asarray(labels0), jnp.asarray(key_indices),
        **kw))
    mesh = make_mesh(n_dev)
    got = np.asarray(propagate_labels(
        jnp.asarray(feats), jnp.asarray(labels0), jnp.asarray(key_indices),
        mesh=mesh, **kw))
    # bitwise: band-splitting the query rows changes no dot product and the
    # per-row top-k selection is independent across rows
    np.testing.assert_array_equal(got, want)


def test_sharded_sparse_odd_radius():
    """Odd radii over-pad the DMA halo (sparse_halo rounds to the sublane
    tile); the band slice must use the same rounded halo so global row
    bookkeeping stays exact."""
    H, W = 32, 10
    n_context, N_targets, C, n_lbl = 3, 4, 8, 4
    feats, labels0 = _setup(5, n_context, N_targets, C, H, W, n_lbl)
    key_indices = context_index_bank(n_context, [0], N_targets)
    kw = dict(n_context=n_context, n_long=1, topk=4, temperature=0.07,
              radius=5.0, backend="sparse_interpret")  # halo rounds 5 -> 8
    want = np.asarray(propagate_labels(
        jnp.asarray(feats), jnp.asarray(labels0), jnp.asarray(key_indices),
        **kw))
    got = np.asarray(propagate_labels(
        jnp.asarray(feats), jnp.asarray(labels0), jnp.asarray(key_indices),
        mesh=make_mesh(4), **kw))
    np.testing.assert_array_equal(got, want)


def test_sharded_sparse_two_long_frames():
    H, W = 24, 9
    n_context, N_targets, C, n_lbl = 2, 6, 8, 3
    feats, labels0 = _setup(1, n_context, N_targets, C, H, W, n_lbl)
    key_indices = context_index_bank(n_context, [0, 1], N_targets)
    kw = dict(n_context=n_context, n_long=2, topk=4, temperature=0.05,
              radius=3.0, backend="sparse_interpret")
    want = np.asarray(propagate_labels(
        jnp.asarray(feats), jnp.asarray(labels0), jnp.asarray(key_indices),
        **kw))
    got = np.asarray(propagate_labels(
        jnp.asarray(feats), jnp.asarray(labels0), jnp.asarray(key_indices),
        mesh=make_mesh(3), **kw))
    np.testing.assert_array_equal(got, want)


def test_sparse_shard_count():
    # ACTIVE bands: each device takes ceil(rows/D) tile rows; uneven splits
    # zero-extend (trailing bands masked dead), so any geometry shards
    assert sparse_shard_count(60, 8, 8) == 8   # DAVIS 480p on a v5e-8
    assert sparse_shard_count(60, 8, 6) == 4   # 8 rows, 2/band -> 4 active
    assert sparse_shard_count(56, 8, 8) == 7   # 7 rows, 1/band
    assert sparse_shard_count(40, 8, 8) == 5   # JHMDB 320px: 5 rows
    assert sparse_shard_count(40, 8, 2) == 2
    assert sparse_shard_count(8, 8, 8) == 1


@pytest.mark.parametrize("H,W,n_dev", [
    (37, 10, 2),    # 5 tile rows over 2 devices: band 1 STRADDLES the grid
                    # edge (rows 24-47 vs 40-row padded grid) — exercises
                    # the zero-extension of the key/label layouts
    (20, 12, 8),    # 3 tile rows over 8 devices: bands 3..7 fully dead
])
def test_sharded_sparse_uneven_bands(H, W, n_dev):
    """Mesh sizes that do not divide the tile-row count shard via
    zero-extended layouts; parity must stay bitwise."""
    n_context, N_targets, C, n_lbl = 3, 4, 8, 4
    feats, labels0 = _setup(7, n_context, N_targets, C, H, W, n_lbl)
    key_indices = context_index_bank(n_context, [0], N_targets)
    kw = dict(n_context=n_context, n_long=1, topk=4, temperature=0.07,
              radius=3.0, backend="sparse_interpret")
    want = np.asarray(propagate_labels(
        jnp.asarray(feats), jnp.asarray(labels0), jnp.asarray(key_indices),
        **kw))
    got = np.asarray(propagate_labels(
        jnp.asarray(feats), jnp.asarray(labels0), jnp.asarray(key_indices),
        mesh=make_mesh(n_dev), **kw))
    np.testing.assert_array_equal(got, want)


def test_mesh_rejected_for_non_sparse_backends():
    H, W = 16, 16
    n_context, N_targets, C, n_lbl = 2, 3, 8, 3
    feats, labels0 = _setup(2, n_context, N_targets, C, H, W, n_lbl)
    key_indices = context_index_bank(n_context, [0], N_targets)
    with pytest.raises(ValueError, match="sparse"):
        propagate_labels(
            jnp.asarray(feats), jnp.asarray(labels0),
            jnp.asarray(key_indices), n_context=n_context, n_long=1,
            topk=4, temperature=0.07, radius=3.0, backend="xla",
            mesh=make_mesh(2))


def test_missing_mesh_axis_rejected():
    H, W = 16, 16
    n_context, N_targets, C, n_lbl = 2, 3, 8, 3
    feats, labels0 = _setup(3, n_context, N_targets, C, H, W, n_lbl)
    key_indices = context_index_bank(n_context, [0], N_targets)
    with pytest.raises(ValueError, match="no axis"):
        propagate_labels(
            jnp.asarray(feats), jnp.asarray(labels0),
            jnp.asarray(key_indices), n_context=n_context, n_long=1,
            topk=4, temperature=0.07, radius=3.0,
            backend="sparse_interpret", mesh=make_mesh(2),
            data_axis="batch")
