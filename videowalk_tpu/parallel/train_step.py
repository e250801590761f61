"""Jitted SPMD train step: Adam + per-step MultiStep LR + CRW loss.

Mirrors the reference training loop body (code/train.py:36-107):
forward -> mean loss -> backward -> Adam step -> per-step LR scheduler step.
Re-designed as one pure function compiled once per node-path (patch vs.
superpixel — the per-step Bernoulli choice stays on the host, matching
code/train.py:54-66, so each branch is a static jit specialization).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    """Carried training state (params + BN stats + optimizer + step)."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def multistep_lr(lr: float, milestones: Sequence[int], gamma: float):
    """Per-step MultiStepLR schedule (reference code/train.py:252-255:
    milestones are epochs scaled by steps-per-epoch, stepped every batch)."""
    if not milestones:
        return lambda step: jnp.asarray(lr, jnp.float32)
    boundaries = {int(m): gamma for m in milestones}
    return optax.piecewise_constant_schedule(lr, boundaries)


def make_optimizer(
    lr: float = 1e-4,
    milestones: Sequence[int] = (),
    gamma: float = 0.3,
    optim: str = "adam",
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
) -> optax.GradientTransformation:
    """Adam (reference default, code/train.py:249) or SGD (--optim sgd).

    Note: the reference constructs Adam WITHOUT weight decay; its --wd flag
    only feeds SGD-style use elsewhere and is unused for Adam. We match.
    """
    schedule = multistep_lr(lr, milestones, gamma)
    if optim == "adam":
        return optax.adam(schedule)
    if optim == "sgd":
        return optax.sgd(schedule, momentum=momentum)
    raise ValueError(f"unknown optimizer {optim!r}")


def create_train_state(model, optimizer, example_batch, rng,
                       sp_mask=None) -> TrainState:
    """Initialize model variables + optimizer state."""
    init_rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
    kwargs = {"sp_mask": sp_mask} if sp_mask is not None else {}
    variables = model.init(init_rngs, example_batch, train=False, **kwargs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        step=jnp.asarray(0, jnp.int32),
    )


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    *,
    with_sp_mask: bool = False,
    frozen_prefixes: tuple[str, ...] = (),
    donate: bool = True,
) -> Callable:
    """Build the jitted train step.

    Args:
      model: CRW or CRWTeacherStudent flax module.
      with_sp_mask: compile the superpixel-path signature (video + ids)
        instead of the patch-path one.
      frozen_prefixes: top-level param-tree keys to freeze (teacher towers) —
        their updates are zeroed explicitly (belt-and-braces on top of
        stop_gradient; see models/teacher_student.py docstring).

    Returns:
      step(state, batch, rng[, sp_mask]) -> (state, metrics) — jitted; under
      a Mesh-sharded batch XLA adds the gradient psum over ICI.
    """

    def loss_fn(params, batch_stats, batch, sp_mask, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        kwargs = {"sp_mask": sp_mask} if sp_mask is not None else {}
        (q, loss, diags), updates = model.apply(
            variables, batch, train=True, rngs={"dropout": rng},
            mutable=["batch_stats"], **kwargs)
        return loss, (updates.get("batch_stats", batch_stats), diags)

    def step_fn(state: TrainState, batch, rng, sp_mask=None):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (new_stats, diags)), grads = grad_fn(
            state.params, state.batch_stats, batch, sp_mask, rng)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params)
        if frozen_prefixes:
            updates = {
                k: (jax.tree_util.tree_map(jnp.zeros_like, v)
                    if k.startswith(frozen_prefixes) else v)
                for k, v in updates.items()
            }
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params, batch_stats=new_stats,
            opt_state=new_opt_state, step=state.step + 1)
        metrics = {"loss": loss, **diags}
        return new_state, metrics

    if with_sp_mask:
        fn = step_fn
    else:
        fn = lambda state, batch, rng: step_fn(state, batch, rng, None)  # noqa: E731
    return jax.jit(fn, donate_argnums=(0,) if donate else ())
