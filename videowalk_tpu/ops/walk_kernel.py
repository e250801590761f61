"""Pallas TPU kernel: fused palindrome-walk loss (forward + custom VJP).

Fuses the CRW hot loss (BASELINE.json north star: "affinity matmul,
temperature softmax with edge dropout, chained palindrome transition
products" in one kernel): for each batch element, the whole chain runs in
VMEM — affinity matmuls, ZeroSoftmax, prefix products, and the per-cycle
cross-entropy — with only q in and per-cycle losses (plus compact residuals)
out. The XLA path (videowalk_tpu/core/walk.py) materializes every (S, B, N,
N) intermediate in HBM; here they live in on-chip scratch.

Math notes:

- CE-over-log identity: the reference computes
  ``CrossEntropyLoss(log(AA + eps), identity)`` (code/model.py:394-396);
  since softmax of log-probabilities is renormalization,
  ``lse(log(AA + eps)) = log(rowsum(AA) + N * eps)`` — so the per-row loss is
  just ``log(rowsum + N*eps) - log(AA_nn + eps)``. No logsumexp needed.
- Padding: N is padded to the 128 lane width with zero node embeddings.
  ZeroSoftmax gives zero-logit (padded) columns exactly-zero transition
  probability, so padded nodes are unreachable; padded rows are excluded
  from the loss mean via ``n_valid``. (The pad columns add N_pad * eps
  inside the rowsum log — ~1e-18, below f32 resolution.)
- Edge dropout masks are sampled OUTSIDE the kernel with jax.random (same
  keyed distribution as the XLA path) and passed in as uint8 planes.
- Backward: hand-derived VJP (see _walk_bwd_kernel); residuals are the
  post-dropout logits D12/D21 and the prefix products F/B.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-20        # reference code/model.py:12
ZSM_EPS = 1e-5     # ZeroSoftmax eps (code/utils/__init__.py:418)
NEG = -1e20        # edge-dropout fill (code/model.py:81)


def _expm1(x):
    # Pallas TPU has no expm1 lowering; exp(x) - 1 matches the reference
    # ZeroSoftmax literally (torch.exp(x) - 1, code/utils/__init__.py:419).
    return jnp.exp(x) - 1.0


def _zsm(x):
    """ZeroSoftmax rows: (e^x - 1)^2 / (row sum + eps)."""
    u = jnp.square(_expm1(x))
    return u / (jnp.sum(u, axis=-1, keepdims=True) + ZSM_EPS)


def _zsm_bwd(x, dy):
    """VJP of _zsm at logits x given upstream dy (same shapes)."""
    u = jnp.square(_expm1(x))
    s = jnp.sum(u, axis=-1, keepdims=True) + ZSM_EPS
    y = u / s
    du = (dy - jnp.sum(dy * y, axis=-1, keepdims=True)) / s
    return du * 2.0 * _expm1(x) * jnp.exp(x)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _walk_fwd_kernel(q_ref, m12_ref, m21_ref, losses_ref, accs_ref,
                     d12_ref, d21_ref, f_ref, b_ref,
                     *, S: int, n_valid: int, temperature: float):
    """One batch element: q (T, N, C) -> per-cycle losses/accs + residuals."""
    N = q_ref.shape[1]
    row_valid = (jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
                 < n_valid)                         # (N, 1)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (N, N), 1))

    # transitions
    for s in range(S):
        qs = q_ref[s]                       # (N, C)
        qn = q_ref[s + 1]
        A = _dot(qs, qn.T)                  # (N, N)
        D12 = jnp.where(m12_ref[s] != 0, NEG, A) / temperature
        D21 = jnp.where(m21_ref[s] != 0, NEG, A.T) / temperature
        d12_ref[s] = D12
        d21_ref[s] = D21

    # prefix products + per-cycle loss
    F = _zsm(d12_ref[0])
    Bk = _zsm(d21_ref[0])
    for i in range(1, S):
        F = _dot(F, _zsm(d12_ref[i]))
        Bk = _dot(_zsm(d21_ref[i]), Bk)
        f_ref[i] = F
        b_ref[i] = Bk
        AA = _dot(F, Bk)
        rowsum = jnp.sum(AA, axis=-1, keepdims=True) + N * EPS   # (N, 1)
        diag = jnp.sum(jnp.where(eye, AA, 0.0), axis=-1,
                       keepdims=True)                             # (N, 1)
        per_row = jnp.log(rowsum) - jnp.log(diag + EPS)
        loss_val = (jnp.sum(jnp.where(row_valid, per_row, 0.0))
                    / n_valid)
        losses_ref[i - 1] = jnp.full((losses_ref.shape[-2],
                                      losses_ref.shape[-1]), loss_val,
                                     jnp.float32)[0]
        # acc: diagonal is the row max (ties count correct; measure-zero
        # difference vs argmax==target on real embeddings)
        rowmax = jnp.max(AA, axis=-1, keepdims=True)              # (N, 1)
        correct = (diag >= rowmax) & row_valid
        acc_val = jnp.sum(correct.astype(jnp.float32)) / n_valid
        accs_ref[i - 1] = jnp.full((accs_ref.shape[-2],
                                    accs_ref.shape[-1]), acc_val,
                                   jnp.float32)[0]


def _walk_bwd_kernel(q_ref, d12_ref, d21_ref, f_ref, b_ref, dl_ref,
                     dq_ref, *, S: int, n_valid: int, temperature: float):
    """Backward for one batch element -> dq (T, N, C)."""
    N = q_ref.shape[1]
    row_valid = (jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
                 < n_valid)                         # (N, 1)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
           ).astype(jnp.float32)

    dq_ref[...] = jnp.zeros(dq_ref.shape, dq_ref.dtype)

    # dF_i / dB_i accumulators, walked in reverse; dP/dQ per step.
    dF = jnp.zeros((N, N), jnp.float32)
    dBk = jnp.zeros((N, N), jnp.float32)
    for i in range(S - 1, 0, -1):
        F = f_ref[i]
        Bk = b_ref[i]
        AA = _dot(F, Bk)
        rowsum = jnp.sum(AA, axis=-1, keepdims=True) + N * EPS
        # dlogits = (softmax - I) / n_valid * upstream, valid rows only
        soft = (AA + EPS) / rowsum
        dl_i = jnp.max(dl_ref[i - 1])  # row-constant upstream grad
        dlog = (soft - eye) * (dl_i / n_valid)
        dlog = jnp.where(row_valid, dlog, 0.0)
        dAA = dlog / (AA + EPS)
        dF = dF + _dot(dAA, Bk.T)
        dBk = dBk + _dot(F.T, dAA)

        # F_i = F_{i-1} @ P_i ; B_i = Q_i @ B_{i-1}
        if i >= 2:
            F_prev = f_ref[i - 1]
            B_prev = b_ref[i - 1]
        else:
            F_prev = _zsm(d12_ref[0])
            B_prev = _zsm(d21_ref[0])
        P_i = _zsm(d12_ref[i])
        Q_i = _zsm(d21_ref[i])
        dP = _dot(F_prev.T, dF)
        dQ = _dot(dBk, B_prev.T)
        dD12 = _zsm_bwd(d12_ref[i], dP) / temperature
        dD21 = _zsm_bwd(d21_ref[i], dQ) / temperature
        dA = dD12 + dD21.T
        dq_ref[i] = dq_ref[i] + _dot(dA, q_ref[i + 1])
        dq_ref[i + 1] = dq_ref[i + 1] + _dot(dA.T, q_ref[i])

        dF = _dot(dF, P_i.T)
        dBk = _dot(Q_i.T, dBk)

    # step 0: P_0 = F_0 gets dF; Q_0 = B_0 gets dBk
    dD12 = _zsm_bwd(d12_ref[0], dF) / temperature
    dD21 = _zsm_bwd(d21_ref[0], dBk) / temperature
    dA = dD12 + dD21.T
    dq_ref[0] = dq_ref[0] + _dot(dA, q_ref[1])
    dq_ref[1] = dq_ref[1] + _dot(dA.T, q_ref[0])


def _pad_nodes(q, n_pad):
    if n_pad == 0:
        return q
    return jnp.pad(q, ((0, 0), (0, 0), (0, n_pad), (0, 0)))


def _fwd_call(q, m12, m21, temperature, n_valid, interpret):
    B, T, N, C = q.shape
    S = T - 1
    kern = functools.partial(_walk_fwd_kernel, S=S, n_valid=n_valid,
                             temperature=temperature)
    out_shapes = (
        jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),  # losses (padded)
        jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),  # accs (padded)
        jax.ShapeDtypeStruct((B, S, N, N), jnp.float32),  # D12
        jax.ShapeDtypeStruct((B, S, N, N), jnp.float32),  # D21
        jax.ShapeDtypeStruct((B, S, N, N), jnp.float32),  # F
        jax.ShapeDtypeStruct((B, S, N, N), jnp.float32),  # B
    )
    grid = (B,)

    def im(i):  # one batch element per program
        return (i, 0, 0, 0)

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, T, N, C), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, S, N, N), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, S, N, N), im, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, S, N, N), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, S, N, N), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, S, N, N), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, S, N, N), im, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(q, m12, m21)


def _bwd_call(q, d12, d21, f, b, dlosses, temperature, n_valid, interpret):
    B, T, N, C = q.shape
    S = T - 1
    kern = functools.partial(_walk_bwd_kernel, S=S, n_valid=n_valid,
                             temperature=temperature)

    def im(i):
        return (i, 0, 0, 0)

    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, T, N, C), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, S, N, N), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, S, N, N), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, S, N, N), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, S, N, N), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, T, N, C), im, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, N, C), jnp.float32),
        interpret=interpret,
    )(q, d12, d21, f, b, dlosses)


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_walk(q, m12, m21, temperature, n_valid):
    S = q.shape[1] - 1
    losses, accs, *_ = _fwd_call(q, m12, m21, temperature, n_valid,
                                 _should_interpret())
    return losses[:, :S - 1, 0], accs[:, :S - 1, 0]


def _fused_walk_fwd(q, m12, m21, temperature, n_valid):
    S = q.shape[1] - 1
    losses, accs, d12, d21, f, b = _fwd_call(
        q, m12, m21, temperature, n_valid, _should_interpret())
    return ((losses[:, :S - 1, 0], accs[:, :S - 1, 0]),
            (q, d12, d21, f, b))


def _fused_walk_bwd(temperature, n_valid, res, grads):
    q, d12, d21, f, b = res
    dlosses, _ = grads  # accs are non-differentiable diagnostics
    B, S_minus_1 = dlosses.shape
    dl_pad = jnp.zeros((B, 8, 128), jnp.float32)
    dl_pad = dl_pad.at[:, :S_minus_1, :].set(dlosses[:, :, None])
    dq = _bwd_call(q, d12, d21, f, b, dl_pad, temperature, n_valid,
                   _should_interpret())
    return dq, None, None


_fused_walk.defvjp(_fused_walk_fwd, _fused_walk_bwd)


def fused_walk_loss(
    q: jax.Array,
    temperature: float,
    *,
    key: jax.Array | None = None,
    edgedrop_rate: float = 0.0,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Drop-in fused replacement for core.walk.crw_walk_loss (patch path,
    ZeroSoftmax, no flip).

    Args:
      q: ``(B, C, T, N)`` L2-normalized node embeddings (model layout).

    Returns:
      (loss, diags) with the same semantics as crw_walk_loss.
    """
    B, C, T, N = q.shape
    S = T - 1
    if T < 3:
        return jnp.asarray(0.0, jnp.float32), {}

    n_valid = N
    N_pad = max(128, -(-N // 128) * 128)
    qt = jnp.transpose(q, (0, 2, 3, 1)).astype(jnp.float32)  # (B, T, N, C)
    qt = _pad_nodes(qt, N_pad - N)
    C_pad = max(128, -(-C // 128) * 128)
    if C_pad != C:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, 0), (0, C_pad - C)))

    if edgedrop_rate > 0:
        assert key is not None
        k12, k21 = jax.random.split(key)
        m12 = (jax.random.uniform(k12, (B, S, N_pad, N_pad))
               < edgedrop_rate).astype(jnp.uint8)
        m21 = (jax.random.uniform(k21, (B, S, N_pad, N_pad))
               < edgedrop_rate).astype(jnp.uint8)
    else:
        m12 = jnp.zeros((B, S, N_pad, N_pad), jnp.uint8)
        m21 = m12

    losses, accs = _fused_walk(qt, m12, m21, float(temperature), n_valid)
    loss = jnp.mean(jnp.sum(losses, axis=-1)) / max(1, S - 1)
    diags = {}
    for i in range(S - 1):
        diags[f"xent cyc r{i + 1}"] = jnp.mean(losses[:, i])
        diags[f"acc cyc r{i + 1}"] = jnp.mean(accs[:, i])
    return loss, diags
