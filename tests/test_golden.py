"""Golden regression tests: bitwise-stable CRW loss on a fixed clip set.

BASELINE.json requires "bitwise-stable CRW loss parity on a fixed clip set":
with fixed seeds, the full model loss must reproduce exactly across runs
(same build), and stay within float tolerance across refactors. The golden
values were recorded from this framework's first verified build (see git
history); any drift indicates a semantic change to the loss path.
"""

import numpy as np

import jax
import jax.numpy as jnp

from videowalk_tpu.models import CRW, CRWConfig


def fixed_clip_set():
    """Deterministic synthetic clip set (seeded; uint8-quantized so the
    inputs are exactly reproducible across numpy versions)."""
    rng = np.random.RandomState(1234)
    clips = rng.randint(0, 256, (2, 4, 4, 32, 32, 3)).astype(np.float32) / 255.0
    return jnp.asarray(clips)


def model_and_vars():
    cfg = CRWConfig(model_type="scratch_zeropad", temperature=0.05,
                    fused_walk="off")
    model = CRW(cfg)
    x = fixed_clip_set()
    variables = model.init(jax.random.PRNGKey(42), x, train=False)
    return model, variables, x


def test_crw_loss_run_to_run_deterministic():
    """Two evaluations of the same jitted fn are bitwise identical."""
    model, variables, x = model_and_vars()
    f = jax.jit(lambda v, xx: model.apply(v, xx, train=False)[1])
    l1 = np.asarray(f(variables, x))
    l2 = np.asarray(f(variables, x))
    assert l1.tobytes() == l2.tobytes()


def test_crw_loss_golden_value():
    """Loss on the fixed clip set matches the recorded golden value.

    Tolerance is float32-refactor-level (1e-5 relative): exact bitwise
    stability holds within a build (test above); across compiler/backend
    versions only near-equality is meaningful.
    """
    model, variables, x = model_and_vars()
    loss = float(model.apply(variables, x, train=False)[1])
    # Golden from the round-1 verified build (CPU f32, highest precision).
    GOLDEN = 1.3863282203674316
    np.testing.assert_allclose(loss, GOLDEN, rtol=1e-4)


def test_crw_loss_param_permutation_sensitivity():
    """Sanity: the golden test can actually fail — different weights move
    the loss."""
    model, variables, x = model_and_vars()
    loss0 = float(model.apply(variables, x, train=False)[1])
    v2 = jax.tree_util.tree_map(lambda p: p * 1.01, variables)
    loss1 = float(model.apply(v2, x, train=False)[1])
    assert loss0 != loss1
