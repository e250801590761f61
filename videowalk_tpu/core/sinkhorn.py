"""Sinkhorn-Knopp iterative doubly-stochastic normalization.

Reference: code/utils/__init__.py:615-639. Used by the experimental
``--sk-align`` / ``--sk-targets`` paths (code/model.py:84,
code/teacherstudent.py:176-182).

TPU design: the reference's data-dependent ``while std > tol`` loop becomes a
``lax.while_loop`` (jit-safe, bounded by ``max_iter``), so the op stays on
device with no host sync per iteration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _l1_normalize(x: jax.Array, axis: int) -> jax.Array:
    """torch F.normalize(p=1) semantics: x / max(sum |x|, eps)."""
    denom = jnp.sum(jnp.abs(x), axis=axis, keepdims=True)
    return x / jnp.maximum(denom, 1e-12)


def sinkhorn_knopp(A: jax.Array, tol: float = 0.01, max_iter: int = 1000) -> jax.Array:
    """Alternate row/column L1 normalization until column sums stabilize.

    Args:
      A: ``(..., N, M)`` non-negative matrix (batched or not, matching the
        reference's ndim>2 / ndim==2 branches).
      tol: stop when std of column sums < tol.
      max_iter: iteration cap.

    Returns:
      Approximately doubly-stochastic matrix of the same shape.
    """
    # Initial global normalization (reference divides by total sum).
    total = jnp.sum(A, axis=(-1, -2), keepdims=True)
    A = A / total

    def cond(state):
        A2, it = state
        # ddof=1: torch Tensor.std is Bessel-corrected — ddof=0 is
        # sqrt((n-1)/n) smaller and can stop one iteration early near tol
        colsum_std = jnp.std(jnp.sum(A2, axis=-2), ddof=1)
        return jnp.logical_or(it == 0,
                              jnp.logical_and(colsum_std > tol, it < max_iter))

    def body(state):
        A2, it = state
        A1 = _l1_normalize(A2, axis=-2)
        A2 = _l1_normalize(A1, axis=-1)
        return A2, it + 1

    A2, _ = jax.lax.while_loop(cond, body, (A, jnp.asarray(0)))
    return A2
