"""Checkpoint save -> restore -> identical step outputs (exact resume)."""

import os

import pytest

# two CLI-scale train sequences + bit-exact compare: slow tier
pytestmark = pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp

from videowalk_tpu.models import CRW, CRWConfig
from videowalk_tpu.parallel import (TrainState, create_train_state,
                                    make_optimizer, make_train_step)
from videowalk_tpu.utils import load_checkpoint, save_checkpoint, partial_load


def test_pth_checkpoint_resume_is_exact(tmp_path):
    """Train 2 steps -> save .pth -> restore into a FRESH state -> the next
    step's loss is bit-identical to continuing without the round trip
    (model weights + optimizer state + step counter all survive)."""
    cfg = CRWConfig(model_type="scratch_zeropad", temperature=0.05)
    model = CRW(cfg)
    opt = make_optimizer(lr=1e-3, milestones=(3,), gamma=0.1)
    rng = np.random.RandomState(0)
    batch = jnp.asarray(rng.randn(2, 3, 4, 32, 32, 3).astype(np.float32))
    state = create_train_state(model, opt, batch[:1], jax.random.PRNGKey(0))
    step = make_train_step(model, opt, donate=False)

    for i in range(2):
        state, _ = step(state, batch, jax.random.PRNGKey(i))

    # save through the reference-format .pth writer
    path = os.path.join(tmp_path, "checkpoint.pth")
    save_checkpoint(
        path,
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)},
        optimizer_state=jax.device_get(state.opt_state),
        lr_scheduler_state={"step": int(state.step)},
        epoch=0, args={})

    # continue WITHOUT the round trip
    cont, m_direct = step(state, batch, jax.random.PRNGKey(99))

    # restore into a fresh state and continue
    fresh = create_train_state(model, opt, batch[:1], jax.random.PRNGKey(7))
    ckpt = load_checkpoint(path)
    variables = {"params": fresh.params, "batch_stats": fresh.batch_stats}
    variables = partial_load(ckpt["model"], variables, verbose=False)
    restored = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=jax.tree_util.tree_map(jnp.asarray, ckpt["optimizer"]),
        step=jnp.asarray(ckpt["lr_scheduler"]["step"], jnp.int32))
    _, m_resumed = step(restored, batch, jax.random.PRNGKey(99))

    assert float(m_direct["loss"]) == float(m_resumed["loss"])
