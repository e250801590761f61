"""Learning sanity: CRW walk accuracy must rise well above chance on
synthetic consistent motion (rolling textures).

Slow (trains ~120 steps); skipped unless VIDEOWALK_RUN_SLOW=1. Last recorded
TPU run (round 1): acc_r1 0.026 -> 0.270 (13x chance) in 120 steps,
loss 4.02 -> 2.03.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videowalk_tpu.data.augs import TrainTransform
from videowalk_tpu.models import CRW, CRWConfig
from videowalk_tpu.parallel import create_train_state, make_optimizer, make_train_step


@pytest.mark.slow
def test_crw_learns_consistent_motion():
    rng0 = np.random.RandomState(0)
    base = rng0.randint(0, 255, (96, 96, 3), np.uint8)

    def make_batch(rng, B=8, T=4):
        tf = TrainTransform(img_size=64, frame_aug="grid",
                            patch_size=(16, 16, 3), rng=rng)
        clips = []
        for _ in range(B):
            t0 = rng.randint(0, 50)
            vid = np.stack([np.roll(base, (t0 + t) * 3, axis=1)
                            for t in range(T)])
            clips.append(tf(vid)["grid"])
        return jnp.asarray(np.stack(clips))

    model = CRW(CRWConfig(model_type="scratch_zeropad", temperature=0.05,
                          edgedrop_rate=0.1))
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(model, opt,
                               make_batch(np.random.RandomState(1))[:1],
                               jax.random.PRNGKey(0))
    step = make_train_step(model, opt, donate=False)

    data_rng = np.random.RandomState(2)
    first_acc = None
    for i in range(120):
        state, m = step(state, make_batch(data_rng), jax.random.PRNGKey(i))
        if i == 0:
            first_acc = float(m["acc cyc r1"])
    final_acc = float(m["acc cyc r1"])
    chance = 1.0 / 49
    assert final_acc > 3 * max(first_acc, chance), (first_acc, final_acc)
