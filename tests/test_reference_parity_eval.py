"""Cross-framework EVAL parity against the actual PyTorch reference.

The train-side parity harness (tests/test_reference_parity.py) anchors the
loss math; this anchors the label-propagation evaluator: identical features
and first-frame labels go through

  reference: context_index_bank + MaskedAttention radius mask +
             mem_efficient_batched_affinity + the autoregressive
             propagation loop (code/test.py:105-160,
             code/utils/test_utils.py:129-179)
  ours:      eval/propagation.propagate_labels (xla and tiled backends)

and the per-frame predicted soft labels must match.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from videowalk_tpu.eval.propagation import context_index_bank, propagate_labels

from _reference_shim import REFERENCE_CODE, load_reference

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_CODE), reason="reference checkout not present")


def _reference_propagate(feats, lbls, n_context, long_mem, radius,
                         temperature, topk):
    """The reference evaluator, verbatim semantics (code/test.py:105-160)."""
    import sys

    ref = load_reference()
    sys.path.insert(0, REFERENCE_CODE)
    try:
        from utils import test_utils as ref_tu
    finally:
        sys.path.remove(REFERENCE_CODE)

    utils = ref["utils"]
    F = torch.from_numpy(feats)[None]             # (1, C, N, H, W)
    L = torch.from_numpy(lbls.copy())             # (N, H, W, n_lbl)
    N = F.shape[2]

    key_indices = ref_tu.context_index_bank(n_context, long_mem,
                                            N - n_context)
    key_indices = torch.cat(key_indices, dim=-1)
    keys, query = F[:, :, key_indices], F[:, :, n_context:]

    restrict = utils.MaskedAttention(radius, flat=False)
    D = restrict.mask(*F.shape[-2:])[None]
    D = D.flatten(-4, -3).flatten(-2)
    D[D == 0] = -1e10
    D[D == 1] = 0

    keys, query = keys.flatten(-2), query.flatten(-2)
    Ws, Is = ref_tu.mem_efficient_batched_affinity(
        query, keys, D, temperature, topk, long_mem, "cpu")

    L[n_context:] *= 0
    preds = []
    for t in range(key_indices.shape[0]):
        ctx_lbls = L[key_indices[t]]              # (L, H, W, n_lbl)
        ctx_lbls = ctx_lbls.flatten(0, 2).transpose(0, 1)  # (n_lbl, L*HW)
        pred = (ctx_lbls[:, Is[t]] * Ws[t][None]).sum(1)
        pred = pred.view(-1, *F.shape[-2:]).permute(1, 2, 0)
        if t > 0:
            L[t + n_context] = pred
        else:                                      # reference quirk: frame 0
            pred = L[0]                            # GT replaces first target
            L[t + n_context] = pred
        preds.append(pred.numpy())
    return np.stack(preds)


@pytest.mark.parametrize("backend", ["xla", "tiled", "sparse_interpret"])
def test_propagation_matches_reference(backend):
    rng = np.random.RandomState(0)
    n_context, n_t, C, H, W, n_lbl = 3, 6, 8, 9, 12, 4
    N = n_context + n_t
    radius, temperature, topk = 3.0, 0.07, 5

    feats = rng.randn(C, N, H, W).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=0, keepdims=True)
    lbls = rng.rand(N, H, W, n_lbl).astype(np.float32)

    want = _reference_propagate(feats, lbls, n_context, [0], radius,
                                temperature, topk)

    got = propagate_labels(
        jnp.asarray(np.transpose(feats, (1, 0, 2, 3))),  # (N, C, H, W)
        jnp.asarray(lbls), jnp.asarray(context_index_bank(n_context, [0], n_t)),
        n_context=n_context, n_long=1, topk=topk, temperature=temperature,
        radius=radius, backend=backend)

    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_context_index_bank_matches_reference():
    import sys

    load_reference()
    sys.path.insert(0, REFERENCE_CODE)
    try:
        from utils import test_utils as ref_tu
    finally:
        sys.path.remove(REFERENCE_CODE)

    for n_context, long_mem, n in [(3, [0], 7), (5, [0], 11), (4, [2], 9)]:
        want = torch.cat(ref_tu.context_index_bank(n_context, long_mem, n),
                         dim=-1).numpy()
        got = context_index_bank(n_context, long_mem, n)
        np.testing.assert_array_equal(got, want)
