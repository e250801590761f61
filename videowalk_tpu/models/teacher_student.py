"""Teacher-student distillation variant of CRW.

Parity surface with reference ``code/teacherstudent.py``:

- ``soft_cross_entropy``  <-> SoftCrossEntropyLoss (:270-292) — true xent
  between two PMFs: ``(-target * log_softmax(input)).sum(-1).mean()``. Note
  the reference feeds *probabilities* (walk products), not logits, into the
  log_softmax — replicated exactly, hack included (:561-563).
- ``CRWTeacherStudent``   <-> (:294-580): a fresh student encoder+head and a
  frozen pretrained teacher; parallel palindrome walks (student with edge
  dropout, teacher without, :499-539); per-cycle CE + soft-xent; total loss
  ``alpha * CRW + (1 - alpha) * TS`` (:575-578).

Differences by design (fixing the reference's prototype state, SURVEY.md §2
row 9): no live ``breakpoint()``/debug prints; the patch-path-only constraint
is enforced by shape (x must be ``(B, T, N, h, w, 3)``); teacher freezing is
``stop_gradient`` on every teacher output (with plain Adam the zero gradients
leave teacher params exactly unchanged — the train step additionally masks
teacher updates out of the optimizer; see parallel/train_step.py).

The walk math is *shared* with CRW (videowalk_tpu.core.walk — the "shared
fused walk kernel" of BASELINE.json), with ``use_zero_softmax=False`` because
CRWBase/CRWTeacherStudent use plain softmax (code/teacherstudent.py:80,389).
The head here has bias=True (code/teacherstudent.py:46,354), unlike CRW's
bias-free head (code/model.py:52).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import flax.linen as nn

from videowalk_tpu.core import walk as walk_lib
from videowalk_tpu.models.crw import CRWConfig, Head
from videowalk_tpu.models.encoder import make_encoder


def soft_cross_entropy(inputs: jax.Array, target: jax.Array) -> jax.Array:
    """True cross-entropy between an input tensor and soft targets.

    ``mean over rows of (-target * log_softmax(input)).sum(-1)``.
    Reference: code/teacherstudent.py:283-292 (reduction='mean').
    """
    log_input = jax.nn.log_softmax(inputs, axis=-1)
    return jnp.mean(jnp.sum(-target * log_input, axis=-1))


class CRWTeacherStudent(nn.Module):
    """Teacher-student CRW (reference code/teacherstudent.py:294).

    Params tree: ``student_encoder`` / ``student_head`` (trainable) and
    ``teacher_encoder`` / ``teacher_head`` (frozen; load via the .pth shim,
    reference loads ``pretrained.pth`` at :321-328).

    Call: ``__call__(x)`` with x ``(B, T, N, h, w, 3)`` patch grids
    (the reference asserts prob==1 / patch-only, code/train.py:136-137).
    Returns ``(q, loss, diags)``.
    """

    cfg: CRWConfig
    alpha: float = 0.5  # --alpha-teacher-student; in [0, 1]

    def setup(self):
        assert 0.0 <= self.alpha <= 1.0, "alpha_teacher_student must be in [0, 1]"
        if self.cfg.sk_targets or self.cfg.zero_diagonal:
            # inert here as in the reference TS (its forward never reads
            # them, code/teacherstudent.py:294-580); raising beats training
            # a different objective than the flags promise
            raise ValueError(
                "--sk-targets/--zero-diagonal are not supported by the "
                "teacher-student model (the reference's TS forward ignores "
                "them too); drop the flag or train plain CRW")
        spec = make_encoder(self.cfg.model_type, self.cfg.remove_layers,
                            dtype=self.cfg.dtype, remat=self.cfg.remat,
                            remat_stages=self.cfg.remat_stages)
        self.student_encoder = spec.module
        self.student_head = Head(in_dim=spec.hid_dim,
                                 depth=self.cfg.head_depth,
                                 use_bias=True, name="student_head")
        tspec = make_encoder(self.cfg.model_type, self.cfg.remove_layers,
                             dtype=self.cfg.dtype, remat=self.cfg.remat,
                             remat_stages=self.cfg.remat_stages)
        self.teacher_encoder = tspec.module
        self.teacher_head = Head(in_dim=tspec.hid_dim,
                                 depth=self.cfg.head_depth,
                                 use_bias=True, name="teacher_head")

    def _nodes(self, x, encoder, head, train, featdrop):
        """pixels_to_nodes for either tower (code/teacherstudent.py:403-470;
        the teacher variant drops featdrop for determinism, :453-455)."""
        B, T, N = x.shape[:3]
        xx = jnp.swapaxes(x, 1, 2).reshape(B * N, T, *x.shape[3:])
        maps = encoder(xx, train=train)
        if featdrop and train and self.cfg.featdrop_rate > 0:
            maps = nn.Dropout(rate=self.cfg.featdrop_rate,
                              deterministic=False)(
                maps, rng=self.make_rng("dropout"))
        feats = maps.mean(axis=(2, 3))
        feats = head(feats)
        feats = walk_lib.l2_normalize(feats, axis=-1)
        return feats.reshape(B, N, T, -1).transpose(0, 3, 2, 1)  # (B,C,T,N)

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert x.ndim == 6, "teacher-student supports the patch path only"
        T = x.shape[1]
        if T < 3:
            # no complete palindrome walk exists (same guard as
            # crw_walk_loss, core/walk.py); a bare T=1/2 trace would index
            # an empty transition stack
            q = self._nodes(x, self.student_encoder, self.student_head,
                            train, featdrop=True)
            # touch the teacher tower so both towers always initialize
            self._nodes(x, self.teacher_encoder, self.teacher_head,
                        False, featdrop=False)
            zero = jnp.zeros((), q.dtype)
            return q, zero, {"crw_loss": zero, "ts_loss": zero}

        q = self._nodes(x, self.student_encoder, self.student_head,
                        train, featdrop=True)
        q_tchr = self._nodes(x, self.teacher_encoder, self.teacher_head,
                             False, featdrop=False)
        q_tchr = jax.lax.stop_gradient(q_tchr)

        # Student walks (edge dropout on), plain softmax (:80).
        key = (self.make_rng("dropout")
               if train and self.cfg.edgedrop_rate > 0 else None)
        A12s, A21s = walk_lib.transition_matrices(
            q, self.cfg.temperature, key=key,
            edgedrop_rate=self.cfg.edgedrop_rate if train else 0.0,
            use_zero_softmax=False)
        AAs = walk_lib.palindrome_products(A12s, A21s, flip=self.cfg.flip)

        # Teacher walks (no dropout, :524-528).
        A12s_t, A21s_t = walk_lib.transition_matrices(
            q_tchr, self.cfg.temperature, use_zero_softmax=False)
        AAs_t = walk_lib.palindrome_products(A12s_t, A21s_t,
                                             flip=self.cfg.flip)
        AAs_t = jax.lax.stop_gradient(AAs_t)

        # Per-cycle CRW xent + teacher-student soft xent (:551-564).
        losses, accs = jax.vmap(walk_lib.walk_xent_loss)(AAs)
        crw_loss = jnp.sum(losses) / max(1, T - 2)

        def ts_cycle(AA, AA_t):
            return soft_cross_entropy(AA.reshape(-1, AA.shape[-1]),
                                      AA_t.reshape(-1, AA_t.shape[-1]))

        ts_losses = jax.vmap(ts_cycle)(AAs, AAs_t)
        ts_loss = jnp.sum(ts_losses) / max(1, T - 2)

        loss = self.alpha * crw_loss + (1.0 - self.alpha) * ts_loss

        tag = "l" if self.cfg.flip else "r"
        diags = {"crw_loss": crw_loss, "ts_loss": ts_loss}
        for i in range(T - 2):
            diags[f"xent cyc {tag}{i + 1}"] = losses[i]
            diags[f"acc cyc {tag}{i + 1}"] = accs[i]
        return q, loss, diags
