"""Core CRW loss math vs. independent NumPy/PyTorch oracles.

The oracles re-derive the reference semantics (SURVEY.md §3.1) from the paper
math — affinity einsum, ZeroSoftmax, palindrome chain, CE-over-log — in plain
torch/numpy, and the JAX implementation must match to float32 tolerance.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from videowalk_tpu.core import (
    EPS,
    affinity,
    crw_walk_loss,
    palindrome_products,
    palindrome_products_reference_assoc,
    sinkhorn_knopp,
    stoch_mat,
    walk_xent_loss,
    xent_targets,
    zero_softmax,
)
from videowalk_tpu.core.walk import l2_normalize, transition_matrices


def rand_q(B=2, C=16, T=4, N=9, seed=0):
    """Random L2-normalized node embeddings (B, C, T, N)."""
    rng = np.random.RandomState(seed)
    q = rng.randn(B, C, T, N).astype(np.float32)
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    return q


# ---------------------------------------------------------------- oracles


def torch_zero_softmax(x, dim=-1, eps=1e-5):
    """Oracle for ZeroSoftmax: (e^x - 1)^2 / (sum + eps)."""
    x_exp = torch.pow(torch.exp(x) - 1, 2)
    return x_exp / (x_exp.sum(dim=dim, keepdim=True) + eps)


def torch_crw_loss(q, temperature, flip=False):
    """Oracle for the full palindrome walk loss (no dropout)."""
    q = torch.from_numpy(q)
    T = q.shape[2]
    As = torch.einsum("bctn,bctm->btnm", q[:, :, :-1], q[:, :, 1:])
    A12s = [torch_zero_softmax(As[:, i] / temperature) for i in range(T - 1)]
    A21s = [torch_zero_softmax(As[:, i].transpose(-1, -2) / temperature)
            for i in range(T - 1)]
    xent = torch.nn.CrossEntropyLoss(reduction="none")
    losses = []
    for i in range(1, len(A12s)):
        g = A12s[: i + 1] + A21s[: i + 1][::-1]
        aar = aal = g[0]
        for a in g[1:]:
            aar, aal = aar @ a, a @ aal
        AA = aal if flip else aar
        B, N = AA.shape[0], AA.shape[-1]
        target = torch.arange(N)[None].repeat(B, 1).view(-1)
        logits = torch.log(AA + EPS).flatten(0, -2)
        losses.append(xent(logits, target).mean())
    return (sum(losses) / max(1, len(losses))).item()


# ------------------------------------------------------------------ tests


def test_zero_softmax_matches_torch():
    x = np.random.RandomState(1).randn(3, 7, 7).astype(np.float32) * 3
    ours = np.asarray(zero_softmax(jnp.asarray(x), axis=-1))
    oracle = torch_zero_softmax(torch.from_numpy(x), dim=-1).numpy()
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-6)


def test_zero_softmax_zero_logits_get_zero_prob():
    """The load-bearing ZeroSoftmax property for padded superpixel nodes."""
    x = np.random.RandomState(2).randn(4, 6).astype(np.float32)
    x[:, 2] = 0.0  # a padded node's affinity column
    p = np.asarray(zero_softmax(jnp.asarray(x), axis=-1))
    assert np.all(p[:, 2] == 0.0)
    # An all-zero row yields an all-zero distribution (not uniform).
    x[1, :] = 0.0
    p = np.asarray(zero_softmax(jnp.asarray(x), axis=-1))
    assert np.all(p[1] == 0.0)


def test_affinity_matches_einsum_oracle():
    q = rand_q()
    ours = np.asarray(affinity(jnp.asarray(q[:, :, :-1]), jnp.asarray(q[:, :, 1:])))
    oracle = np.einsum("bctn,bctm->btnm", q[:, :, :-1], q[:, :, 1:])
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-6)


def test_affinity_no_time_axis_squeeze():
    q = rand_q(T=2)
    f1, f2 = jnp.asarray(q[:, :, 0]), jnp.asarray(q[:, :, 1])
    A = affinity(f1, f2)
    assert A.shape == (2, 9, 9)


@pytest.mark.parametrize("flip", [False, True])
def test_palindrome_scan_matches_reference_assoc(flip):
    q = rand_q(T=6, N=8)
    A12s, A21s = transition_matrices(jnp.asarray(q), 0.07)
    fast = np.asarray(palindrome_products(A12s, A21s, flip=flip))
    exact = np.asarray(palindrome_products_reference_assoc(A12s, A21s, flip=flip))
    assert fast.shape == (4, 2, 8, 8)
    np.testing.assert_allclose(fast, exact, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("flip", [False, True])
@pytest.mark.parametrize("temperature", [0.07, 0.05])
def test_crw_loss_matches_torch_oracle(flip, temperature):
    q = rand_q(B=2, C=12, T=5, N=10, seed=3)
    loss, diags = jax.jit(
        lambda qq: crw_walk_loss(qq, temperature, flip=flip)
    )(jnp.asarray(q))
    oracle = torch_crw_loss(q, temperature, flip=flip)
    np.testing.assert_allclose(float(loss), oracle, rtol=1e-4)
    tag = "l" if flip else "r"
    assert f"xent cyc {tag}1" in diags and f"acc cyc {tag}3" in diags


def test_crw_loss_reference_assoc_path():
    q = rand_q(seed=4)
    loss_fast, _ = crw_walk_loss(jnp.asarray(q), 0.07)
    loss_ref, _ = crw_walk_loss(jnp.asarray(q), 0.07, reference_assoc=True)
    np.testing.assert_allclose(float(loss_fast), float(loss_ref), rtol=1e-5)


def test_padded_nodes_contribute_constant_loss():
    """Zero-feature (padded) nodes behave exactly like the reference's
    absent superpixel ids: zero affinity -> zero walk probability -> a
    constant log-uniform CE term."""
    q = rand_q(B=1, C=8, T=4, N=6, seed=5)
    q[:, :, :, 4:] = 0.0  # two padded nodes
    loss, _ = crw_walk_loss(jnp.asarray(q), 0.05)
    oracle = torch_crw_loss(q, 0.05)
    np.testing.assert_allclose(float(loss), oracle, rtol=1e-4)


def test_edge_dropout_distribution():
    key = jax.random.PRNGKey(0)
    A = jnp.zeros((64, 64)) + 1.0
    from videowalk_tpu.core import edge_dropout
    out = np.asarray(edge_dropout(key, A, 0.25))
    frac = (out == -1e20).mean()
    assert abs(frac - 0.25) < 0.03
    # rate=0 is the identity (exact parity mode)
    np.testing.assert_array_equal(np.asarray(edge_dropout(key, A, 0.0)), np.asarray(A))


def test_stoch_mat_rows_sum_to_one_ish():
    A = jnp.asarray(np.random.RandomState(7).randn(2, 5, 5).astype(np.float32))
    P = np.asarray(stoch_mat(A, 0.07))
    np.testing.assert_allclose(P.sum(-1), np.ones((2, 5)), atol=1e-3)


def test_sinkhorn_doubly_stochastic():
    rng = np.random.RandomState(8)
    A = jnp.asarray(np.exp(rng.randn(6, 6)).astype(np.float32))
    P = np.asarray(sinkhorn_knopp(A, tol=1e-3, max_iter=500))
    np.testing.assert_allclose(P.sum(-1), P.sum(-1) * 0 + P.sum(-1).mean(), atol=1e-2)
    np.testing.assert_allclose(P.sum(-2).std(), 0.0, atol=1e-3)


def test_sinkhorn_matches_torch_oracle():
    rng = np.random.RandomState(9)
    A = np.exp(rng.randn(2, 5, 5)).astype(np.float32)

    At = torch.from_numpy(A)
    At = At / At.sum(-1).sum(-1)[:, None, None]
    A2 = At
    it = 0
    while (A2.sum(-2).std() > 0.01 and it < 100) or it == 0:
        A1 = F.normalize(A2, p=1, dim=-2)
        A2 = F.normalize(A1, p=1, dim=-1)
        it += 1

    ours = np.asarray(sinkhorn_knopp(jnp.asarray(A), tol=0.01, max_iter=100))
    np.testing.assert_allclose(ours, A2.numpy(), rtol=1e-4, atol=1e-6)


def test_l2_normalize_zero_safe():
    x = jnp.zeros((3, 4))
    out = np.asarray(l2_normalize(x, axis=-1))
    assert np.all(out == 0)


def test_walk_xent_loss_matches_torch_ce():
    rng = np.random.RandomState(10)
    AA = np.abs(rng.rand(2, 7, 7)).astype(np.float32)
    AA = AA / AA.sum(-1, keepdims=True)
    loss, acc = walk_xent_loss(jnp.asarray(AA))
    logits = torch.log(torch.from_numpy(AA) + EPS).flatten(0, 1)
    target = torch.arange(7)[None].repeat(2, 1).view(-1)
    oracle = torch.nn.CrossEntropyLoss()(logits, target).item()
    np.testing.assert_allclose(float(loss), oracle, rtol=1e-5)


def test_xent_targets():
    t = np.asarray(xent_targets(2, 3))
    np.testing.assert_array_equal(t, [0, 1, 2, 0, 1, 2])


def test_zero_diagonal_reaches_the_loss():
    """--zero-diagonal wiring (VERDICT round-1 weak #5): diagonal transition
    probability is exactly zero and the loss differs from the unzeroed one.
    Oracle: the reference's zeroout_diag semantics (code/model.py:58-61,
    A * (1 - eye) before dropout/softmax) applied with torch."""
    import torch

    from videowalk_tpu.core import walk

    rng = np.random.RandomState(11)
    B, C, T, N = 2, 16, 4, 7
    q = rng.randn(B, C, T, N).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    A12s, A21s = walk.transition_matrices(
        jnp.asarray(q), 0.07, zero_diagonal=True)
    diag = np.diagonal(np.asarray(A12s), axis1=-2, axis2=-1)
    np.testing.assert_array_equal(diag, np.zeros_like(diag))

    # torch oracle for one step
    qt = torch.from_numpy(q)
    At = torch.einsum("bctn,bctm->btnm", qt[:, :, :-1], qt[:, :, 1:])
    A0 = At[:, 0] * (1.0 - torch.eye(N))
    x = (A0 / 0.07).expm1().pow(2)
    oracle = (x / (x.sum(-1, keepdim=True) + 1e-5)).numpy()
    np.testing.assert_allclose(np.asarray(A12s[0]), oracle, rtol=1e-4,
                               atol=1e-6)

    loss_zd, _ = walk.crw_walk_loss(jnp.asarray(q), 0.07, zero_diagonal=True)
    loss, _ = walk.crw_walk_loss(jnp.asarray(q), 0.07)
    assert not np.isclose(float(loss_zd), float(loss))


def test_zero_diagonal_config_plumbed_through_model():
    """CRWConfig.zero_diagonal changes the model loss (end-to-end wiring)."""
    import jax

    from videowalk_tpu.models.crw import CRW, CRWConfig

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 3, 4, 32, 32, 3).astype(np.float32))
    losses = {}
    for zd in (False, True):
        cfg = CRWConfig(model_type="scratch_zeropad", temperature=0.05,
                        zero_diagonal=zd)
        m = CRW(cfg)
        v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        _, loss, _ = m.apply(v, x, train=False)
        losses[zd] = float(loss)
    assert not np.isclose(losses[True], losses[False])
