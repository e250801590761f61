"""Contrastive-random-walk loss math, TPU-first.

Semantics parity with the PyTorch reference ``paolomandica/sapienza-video-contrastive``:

- ``affinity``      <-> ``code/model.py:63-72``  (einsum 'bctn,bctm->btnm')
- ``zero_softmax``  <-> ``code/utils/__init__.py:414-422``  ((e^x - 1)^2 / (sum + eps))
- ``edge_dropout``  <-> ``code/model.py:80-81``  (A[rand < p] = -1e20), but keyed/pure
- ``stoch_mat``     <-> ``code/model.py:74-90``
- ``palindrome_products`` <-> ``code/model.py:376-382`` (chained transition products)
- ``walk_xent_loss``      <-> ``code/model.py:384-401,413,417-425``

Design notes (TPU):

- Transition matrices are carried as a single stacked tensor ``(S, B, N, N)``
  rather than Python lists, so the whole walk compiles to one fused loop.
- The palindrome chain is a single ``lax.scan`` carrying forward/backward
  prefix products: O(T) batched matmuls total, versus the reference's O(T^2)
  Python loop. ``palindrome_products_reference_assoc`` keeps the reference's
  exact left-to-right association (O(T^2)) for numerical parity testing.
- Dropout is PRNG-keyed (pure) instead of in-place CUDA rand; with the same
  rate it matches the reference's *distribution* (exact parity with rate=0).
- Padded (absent) superpixel nodes need no special masking: they carry
  all-zero features, hence all-zero affinity logits, and ``zero_softmax``
  assigns them exactly-zero probability — that is the reason the reference
  uses ZeroSoftmax instead of softmax on this path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Matches the reference's EPS at code/model.py:12.
EPS = 1e-20
# Matches torch.nn.functional.normalize's default eps (used on node features).
L2_NORM_EPS = 1e-12


def l2_normalize(x: jax.Array, axis: int = -1) -> jax.Array:
    """L2-normalize with torch.nn.functional.normalize semantics.

    ``x / max(||x||_2, eps)`` — maps all-zero vectors to all-zero vectors,
    which is load-bearing for padded superpixel nodes (see module docstring).
    Reference: code/model.py:118,329.

    Zero-vector *gradients* are defined as zero (the double-where trick;
    torch special-cases its 2-norm backward the same way) — otherwise padded
    superpixel slots poison the whole encoder gradient with 0 * NaN.
    """
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    safe_sq = jnp.where(sq > 0, sq, 1.0)   # keeps sqrt grad finite at 0
    out = x / jnp.maximum(jnp.sqrt(safe_sq), L2_NORM_EPS)
    return jnp.where(sq > 0, out, 0.0)


def affinity(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Pairwise node affinities between adjacent-frame embeddings.

    Args:
      x1, x2: ``(B, C, T, N)`` L2-normalized node embeddings (or ``(B, C, N)``
        without a time axis, mirroring the reference's unsqueeze path).

    Returns:
      ``(B, T, N, M)`` affinity logits (``(B, N, M)`` if no time axis).

    Reference: code/model.py:63-72.
    """
    squeeze = x1.ndim < 4
    if squeeze:
        x1, x2 = x1[:, :, None, :], x2[:, :, None, :]
    A = jnp.einsum("bctn,bctm->btnm", x1, x2,
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
    return A[:, 0] if squeeze else A


def zero_softmax(x: jax.Array, axis: int = -1, eps: float = 1e-5) -> jax.Array:
    """Softmax variant that assigns exactly-zero probability to zero logits.

    ``(e^x - 1)^2 / (sum_axis (e^x - 1)^2 + eps)``.

    Reference: code/utils/__init__.py:414-422 (ZeroSoftmax).
    """
    x_exp = jnp.square(jnp.expm1(x))
    x_exp_sum = jnp.sum(x_exp, axis=axis, keepdims=True)
    return x_exp / (x_exp_sum + eps)


def edge_dropout(key: jax.Array, A: jax.Array, rate: float) -> jax.Array:
    """Drop edges by setting logits to -1e20 with probability ``rate``.

    Pure, keyed equivalent of the reference's in-place
    ``A[torch.rand_like(A) < rate] = -1e20`` (code/model.py:80-81).
    """
    if rate <= 0:
        return A
    drop = jax.random.uniform(key, A.shape) < rate
    return jnp.where(drop, jnp.asarray(-1e20, A.dtype), A)


def stoch_mat(
    A: jax.Array,
    temperature: float,
    *,
    key: jax.Array | None = None,
    edgedrop_rate: float = 0.0,
    do_dropout: bool = True,
    zero_diagonal: bool = False,
    do_sinkhorn: bool = False,
    use_zero_softmax: bool = True,
) -> jax.Array:
    """Affinity logits -> stochastic transition matrix.

    Reference: code/model.py:74-90 (CRW uses ZeroSoftmax; the teacher-student
    variant uses plain softmax, code/teacherstudent.py:80,389 — select with
    ``use_zero_softmax``).
    """
    if zero_diagonal:
        n = A.shape[-1]
        A = A * (1.0 - jnp.eye(n, dtype=A.dtype))
    if do_dropout and edgedrop_rate > 0:
        assert key is not None, "edge dropout requires a PRNG key"
        A = edge_dropout(key, A, edgedrop_rate)
    if do_sinkhorn:
        from videowalk_tpu.core.sinkhorn import sinkhorn_knopp
        return sinkhorn_knopp(jnp.exp(A / temperature), tol=0.01, max_iter=100)
    if use_zero_softmax:
        return zero_softmax(A / temperature, axis=-1)
    return jax.nn.softmax(A / temperature, axis=-1)


def transition_matrices(
    q: jax.Array,
    temperature: float,
    *,
    key: jax.Array | None = None,
    edgedrop_rate: float = 0.0,
    use_zero_softmax: bool = True,
    zero_diagonal: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Node embeddings -> stacked forward/backward transition matrices.

    Args:
      q: ``(B, C, T, N)`` L2-normalized node embeddings.
      zero_diagonal: zero the affinity diagonal before dropout/softmax —
        ``--zero-diagonal``. (The reference parses the flag,
        code/utils/arguments.py:156, but its CRW forward never passes it to
        stoch_mat; here it is actually wired. Semantics follow the
        reference's ``zeroout_diag``, code/model.py:58-61: zeroed logits
        then get exactly-zero probability under ZeroSoftmax.)

    Returns:
      ``(A12s, A21s)`` each ``(T-1, B, N, N)``: forward (t -> t+1) and
      backward (t+1 -> t) stochastic matrices.

    Reference: code/model.py:368-374. The reference materializes Python lists
    of per-step matrices; here the steps live on a leading axis so XLA sees
    one batched softmax + one batched dropout.
    """
    T = q.shape[2]
    As = affinity(q[:, :, :-1], q[:, :, 1:])        # (B, T-1, N, N)
    As = jnp.moveaxis(As, 1, 0)                      # (T-1, B, N, N)
    if zero_diagonal:
        As = As * (1.0 - jnp.eye(As.shape[-1], dtype=As.dtype))
    AsT = jnp.swapaxes(As, -1, -2)

    if edgedrop_rate > 0:
        assert key is not None
        k12, k21 = jax.random.split(key)
        # Independent masks per step & direction, matching the reference's
        # independent rand_like draws per stoch_mat call.
        As = edge_dropout(k12, As, edgedrop_rate)
        AsT = edge_dropout(k21, AsT, edgedrop_rate)

    sm = zero_softmax if use_zero_softmax else jax.nn.softmax
    A12s = sm(As / temperature, axis=-1)
    A21s = sm(AsT / temperature, axis=-1)
    del T
    return A12s, A21s


def palindrome_products(
    A12s: jax.Array, A21s: jax.Array, *, flip: bool = False
) -> jax.Array:
    """All palindrome cycle transition products, via prefix-product scan.

    For each cycle length i in 1..S-1 (S = T-1), the reference walks
    ``A12_0 ... A12_i A21_i ... A21_0`` and takes the left-to-right product
    (code/model.py:376-382). Writing F_i = A12_0 @ ... @ A12_i and
    B_i = A21_i @ ... @ A21_0, the cycle product is ``AA_i = F_i @ B_i``.
    Both F and B are prefix products computable in one ``lax.scan`` —
    O(T) batched matmuls instead of the reference's O(T^2) re-walks.

    (Floating-point association differs from the reference's strict
    left-to-right fold in the backward half; see
    ``palindrome_products_reference_assoc`` for the parity-exact variant.)

    Args:
      A12s, A21s: ``(S, B, N, N)`` stacked transition matrices.
      flip: reference's ``--flip`` "bug" variant, which accumulates products
        on the left: ``aal_i = A21_0 @ ... @ A21_i @ A12_i @ ... @ A12_0``.

    Returns:
      ``(S-1, B, N, N)`` stacked cycle products AA_1..AA_{S-1}.
    """

    def dot(a, b):
        return jnp.einsum("bij,bjk->bik", a, b,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)

    if flip:
        # aal_i = (A21_0 @ ... @ A21_i) @ (A12_i @ ... @ A12_0) = L_i @ R_i.
        def step(carry, xs):
            L, R = carry
            a12, a21 = xs
            L = dot(L, a21)       # L_i = L_{i-1} @ A21_i
            R = dot(a12, R)       # R_i = A12_i @ R_{i-1}
            return (L, R), dot(L, R)

        init = (A21s[0], A12s[0])
    else:
        # aar_i = (A12_0 @ ... @ A12_i) @ (A21_i @ ... @ A21_0) = F_i @ B_i.
        def step(carry, xs):
            F, Bk = carry
            a12, a21 = xs
            F = dot(F, a12)       # F_i = F_{i-1} @ A12_i
            Bk = dot(a21, Bk)     # B_i = A21_i @ B_{i-1}
            return (F, Bk), dot(F, Bk)

        init = (A12s[0], A21s[0])

    _, AAs = jax.lax.scan(step, init, (A12s[1:], A21s[1:]))
    return AAs


def palindrome_products_reference_assoc(
    A12s: jax.Array, A21s: jax.Array, *, flip: bool = False
) -> jax.Array:
    """Palindrome products with the reference's exact fold association.

    Strict re-walk of each cycle left-to-right (or right-to-left under
    ``flip``), exactly as code/model.py:376-382. O(T^2) matmuls; used for
    numerical parity tests and available behind a debug flag.
    """
    S = A12s.shape[0]
    AAs = []
    for i in range(1, S):
        g = [A12s[j] for j in range(i + 1)] + [A21s[j] for j in range(i, -1, -1)]
        aar = aal = g[0]
        for a in g[1:]:
            aar = jnp.einsum("bij,bjk->bik", aar, a,
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
            aal = jnp.einsum("bij,bjk->bik", a, aal,
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
        AAs.append(aal if flip else aar)
    return jnp.stack(AAs)


def sk_targets_walk_loss(
    q: jax.Array,
    temperature: float,
    *,
    key: jax.Array | None = None,
    edgedrop_rate: float = 0.0,
    use_zero_softmax: bool = False,
    sk_tol: float = 0.001,
    sk_max_iter: int = 10,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Experimental Sinkhorn-Knopp-target walk loss (--sk-targets).

    Reference: code/teacherstudent.py:174-182 (CRWBase's sk_targets branch):
    the forward chain product ``a12_i = A12_0 @ ... @ A12_i`` is scored
    against argmax targets from a Sinkhorn-normalized chain of
    dropout-free transition products (targets are stop-gradient).

    (The reference CRW class carries the ``sk_targets`` attribute but its
    forward never branches on it — only CRWBase does; here the path is
    usable from both models.)
    """
    from videowalk_tpu.core.sinkhorn import sinkhorn_knopp

    T = q.shape[2]
    if T < 3:
        return jnp.asarray(0.0, jnp.float32), {}

    As = affinity(q[:, :, :-1], q[:, :, 1:])   # (B, S, N, N)
    As = jnp.moveaxis(As, 1, 0)                # (S, B, N, N)
    sm = zero_softmax if use_zero_softmax else jax.nn.softmax
    A12s_drop = As
    if edgedrop_rate > 0:
        assert key is not None
        A12s_drop = edge_dropout(key, As, edgedrop_rate)
    A12s = sm(A12s_drop / temperature, axis=-1)
    Ats = sinkhorn_knopp(jnp.exp(As / temperature), tol=0.01, max_iter=100)

    def dot(a, b):
        return jnp.einsum("bij,bjk->bik", a, b,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)

    def step(carry, xs):
        a12, at = carry
        a12_i, at_i = xs
        a12 = dot(a12, a12_i)
        at = dot(at_i, at)
        targets = jnp.argmax(
            jax.lax.stop_gradient(
                sinkhorn_knopp(at, tol=sk_tol, max_iter=sk_max_iter)),
            axis=-1)                            # (B, N)
        return (a12, at), (a12, targets)

    (_, _), (a12s, targets) = jax.lax.scan(
        step, (A12s[0], Ats[0]), (A12s[1:], Ats[1:]))

    def cycle_loss(a12, tgt):
        logits = jnp.log(a12 + EPS)
        lse = jax.nn.logsumexp(logits, axis=-1)
        picked = jnp.take_along_axis(logits, tgt[..., None],
                                     axis=-1)[..., 0]
        loss = jnp.mean(lse - picked)
        acc = jnp.mean((jnp.argmax(logits, -1) == tgt).astype(jnp.float32))
        return loss, acc

    losses, accs = jax.vmap(cycle_loss)(a12s, targets)
    loss = jnp.sum(losses) / max(1, T - 2)
    diags = {}
    for i in range(T - 2):
        diags[f"xent sk {i + 1}"] = losses[i]
        diags[f"acc sk {i + 1}"] = accs[i]
    return loss, diags


def xent_targets(B: int, N: int) -> jax.Array:
    """Identity targets for cycle-consistency: each node returns to itself.

    Reference: code/model.py:417-425 (device-cached arange; under jit a plain
    broadcasted iota is free).
    """
    return jnp.broadcast_to(jnp.arange(N), (B, N)).reshape(-1)


def walk_xent_loss(AA: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Cross-entropy of one cycle product against identity targets.

    logits = log(AA + EPS); loss = softmax-CE(logits, arange targets).
    Note the reference applies nn.CrossEntropyLoss *on top of* the log —
    i.e. a log-softmax over log-probabilities — so we replicate exactly:
    ``-logit[target] + logsumexp(logits)``.

    Args:
      AA: ``(B, N, N)`` cycle transition product.

    Returns:
      ``(loss, acc)`` scalars.

    Reference: code/model.py:394-399.
    """
    logits = jnp.log(AA + EPS)                        # (B, N, N)
    lse = jax.nn.logsumexp(logits, axis=-1)           # (B, N)
    diag = jnp.diagonal(logits, axis1=-2, axis2=-1)   # (B, N) — logit[target]
    loss = jnp.mean(lse - diag)
    acc = jnp.mean((jnp.argmax(logits, axis=-1)
                    == jnp.arange(AA.shape[-1])[None, :]).astype(jnp.float32))
    return loss, acc


def crw_walk_loss(
    q: jax.Array,
    temperature: float,
    *,
    key: jax.Array | None = None,
    edgedrop_rate: float = 0.0,
    flip: bool = False,
    use_zero_softmax: bool = True,
    zero_diagonal: bool = False,
    reference_assoc: bool = False,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Full CRW palindrome loss from node embeddings.

    Args:
      q: ``(B, C, T, N)`` L2-normalized node embeddings.

    Returns:
      ``(loss, diagnostics)`` — loss is the mean over the T-2 cycles
      (reference divides the sum by ``len(xents) - 1`` where xents includes a
      leading 0: code/model.py:391,413); diagnostics hold per-cycle
      xent/acc as ``{"xent cyc r{i}": ..., "acc cyc r{i}": ...}``.

    Reference: code/model.py:334-415 (walk + loss sections).
    """
    T = q.shape[2]
    if T < 3:
        # No complete palindrome cycle exists; the reference's loss is the
        # empty sum (code/model.py:391,413 -> 0).
        return jnp.asarray(0.0, jnp.float32), {}
    A12s, A21s = transition_matrices(
        q, temperature, key=key, edgedrop_rate=edgedrop_rate,
        use_zero_softmax=use_zero_softmax, zero_diagonal=zero_diagonal)
    prod = (palindrome_products_reference_assoc if reference_assoc
            else palindrome_products)
    AAs = prod(A12s, A21s, flip=flip)                 # (T-2, B, N, N)

    losses, accs = jax.vmap(walk_xent_loss)(AAs)      # (T-2,), (T-2,)
    loss = jnp.sum(losses) / max(1, T - 2)

    tag = "l" if flip else "r"
    diags = {}
    for i in range(T - 2):
        diags[f"xent cyc {tag}{i + 1}"] = losses[i]
        diags[f"acc cyc {tag}{i + 1}"] = accs[i]
    return loss, diags
