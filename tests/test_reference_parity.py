"""Cross-framework parity against the ACTUAL PyTorch reference.

Round 1 tested against torch oracles re-written inside the tests; these tests
import the real reference implementation from /root/reference/code (via
tests/_reference_shim.py), load weights exported with ``flax_to_torch_state``
into it, and assert loss equality on fixed clips. This is the parity anchor —
if this framework misread any reference semantics, these tests fail.

Covered (VERDICT.md round-1 item 1):
  (a) patch path          code/model.py:334-415 (pixels_to_nodes + walk loss)
  (b) superpixel path     code/model.py:260-332 (view_as_windows pooling),
      with absent superpixel slots exercising the ZeroSoftmax padding contract
  (c) --flip              code/model.py:376-382 (left-accumulated products)
  (d) teacher-student     code/teacherstudent.py:472-578, teacher .pth loaded
      through the reference's own torch.load path (:321-328)
  (e) MLP head depth>0    code/model.py:47-56
  (f) superpixel dilation code/model.py:303-309 (grouped fp16 conv)
"""

from __future__ import annotations

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from videowalk_tpu.models.crw import CRW, CRWConfig
from videowalk_tpu.models.teacher_student import CRWTeacherStudent
from videowalk_tpu.utils.checkpoint import flax_to_torch_state, save_checkpoint

from _reference_shim import REFERENCE_CODE, load_reference, reference_args

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_CODE), reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _export_to(ref_model, variables):
    state = flax_to_torch_state(variables)
    tstate = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()}
    missing, unexpected = ref_model.load_state_dict(tstate, strict=False)
    assert not missing, f"export missing reference keys: {missing}"
    assert not unexpected, f"export produced unknown keys: {unexpected}"


def _patch_clip(B=1, T=4, N=9, h=64, w=64, seed=0):
    rs = np.random.RandomState(seed)
    xj = rs.randn(B, T, N, h, w, 3).astype(np.float32) * 0.2
    # reference layout (B, T, N*3, H, W): channels [3n:3n+3] = patch n
    # (code/model.py:348-349 splits channel-major).
    xt = np.transpose(xj, (0, 1, 2, 5, 3, 4)).reshape(B, T, N * 3, h, w)
    return jnp.asarray(xj), torch.from_numpy(xt)


def _sp_clip(B=1, T=4, h=96, w=96, max_sp=12, present=9, seed=1):
    rs = np.random.RandomState(seed)
    xj = rs.randn(B, T, h, w, 3).astype(np.float32) * 0.2
    # Blocky random superpixel ids using only `present` of max_sp slots, so
    # absent slots exercise the zero-feature / ZeroSoftmax padding contract.
    coarse = rs.randint(0, present, size=(B, T, h // 8, w // 8))
    ids = np.kron(coarse, np.ones((8, 8), dtype=np.int64))[:, :T]
    ids = ids.reshape(B, T, h, w)
    xt = torch.from_numpy(np.transpose(xj, (0, 1, 4, 2, 3)))
    mask_t = torch.from_numpy(np.repeat(ids[:, :, None], 3, axis=2))
    return jnp.asarray(xj), jnp.asarray(ids), xt, mask_t


def _build_pair(ref, cfg_overrides=None, args_overrides=None):
    args = reference_args(**(args_overrides or {}))
    torch.manual_seed(0)
    ref_model = ref["model"].CRW(args)
    ref_model.eval()
    cfg = CRWConfig(model_type="scratch", temperature=0.05,
                    **(cfg_overrides or {}))
    return ref_model, CRW(cfg)


def _assert_loss_close(loss_t, loss_j, q_t=None, q_j=None):
    np.testing.assert_allclose(float(loss_t), float(loss_j), rtol=1e-5)
    if q_t is not None:
        np.testing.assert_allclose(np.asarray(q_j), q_t.detach().numpy(),
                                   atol=2e-5)


def test_patch_path_loss_parity(ref):
    ref_model, m = _build_pair(ref)
    xj, xt = _patch_clip()
    variables = m.init({"params": jax.random.PRNGKey(0)}, xj, train=False)
    _export_to(ref_model, variables)
    with torch.no_grad():
        q_t, loss_t, _ = ref_model(xt, None, None)
    q_j, loss_j, _ = m.apply(variables, xj, train=False)
    _assert_loss_close(loss_t, loss_j, q_t, q_j)


def test_superpixel_path_loss_parity(ref):
    max_sp = 12
    ref_model, m = _build_pair(ref, cfg_overrides=dict(max_sp_num=max_sp))
    xj, ids, xt, mask_t = _sp_clip(max_sp=max_sp)
    variables = m.init({"params": jax.random.PRNGKey(0)}, xj, sp_mask=ids,
                       train=False)
    _export_to(ref_model, variables)
    with torch.no_grad():
        q_t, loss_t, _ = ref_model(xt, mask_t, max_sp)
    q_j, loss_j, _ = m.apply(variables, xj, sp_mask=ids, train=False)
    _assert_loss_close(loss_t, loss_j, q_t, q_j)


def test_superpixel_dilation_loss_parity(ref):
    max_sp = 12
    ref_model, m = _build_pair(
        ref,
        cfg_overrides=dict(max_sp_num=max_sp, dilate_superpixels=True,
                           dilation_kernel_size=5, dilation_kernel_shape="L1"),
        args_overrides=dict(dilate_superpixels=True, dilation_kernel_size=5,
                            dilation_kernel_shape="L1"))
    xj, ids, xt, mask_t = _sp_clip(max_sp=max_sp, seed=3)
    variables = m.init({"params": jax.random.PRNGKey(0)}, xj, sp_mask=ids,
                       train=False)
    _export_to(ref_model, variables)
    try:
        with torch.no_grad():
            q_t, loss_t, _ = ref_model(xt, mask_t, max_sp)
    except (RuntimeError, NotImplementedError) as e:  # pragma: no cover
        pytest.skip(f"torch CPU fp16 grouped conv unsupported here: {e}")
    q_j, loss_j, _ = m.apply(variables, xj, sp_mask=ids, train=False)
    _assert_loss_close(loss_t, loss_j, q_t, q_j)


def test_flip_variant_loss_parity(ref):
    ref_model, m = _build_pair(ref, cfg_overrides=dict(flip=True),
                               args_overrides=dict(flip=True))
    xj, xt = _patch_clip(seed=5)
    variables = m.init({"params": jax.random.PRNGKey(0)}, xj, train=False)
    _export_to(ref_model, variables)
    with torch.no_grad():
        _, loss_t, _ = ref_model(xt, None, None)
    _, loss_j, _ = m.apply(variables, xj, train=False)
    _assert_loss_close(loss_t, loss_j)


def test_mlp_head_loss_parity(ref):
    ref_model, m = _build_pair(ref, cfg_overrides=dict(head_depth=1),
                               args_overrides=dict(head_depth=1))
    xj, xt = _patch_clip(seed=7)
    variables = m.init({"params": jax.random.PRNGKey(0)}, xj, train=False)
    _export_to(ref_model, variables)
    with torch.no_grad():
        _, loss_t, _ = ref_model(xt, None, None)
    _, loss_j, _ = m.apply(variables, xj, train=False)
    _assert_loss_close(loss_t, loss_j)


def test_teacher_student_loss_parity(ref, tmp_path):
    alpha = 0.3
    cfg = CRWConfig(model_type="scratch", temperature=0.05, head_bias=True,
                    use_zero_softmax=False)
    m = CRWTeacherStudent(cfg, alpha=alpha)
    xj, xt = _patch_clip(seed=9)
    variables = m.init({"params": jax.random.PRNGKey(0)}, xj, train=False)
    full_state = flax_to_torch_state(variables)

    # Teacher .pth consumed by the reference's own torch.load
    # (code/teacherstudent.py:321-328): CRWBase-named keys = the teacher
    # tower's keys with the 'teacher.' prefix stripped.
    teacher_state = {
        k[len("teacher."):]: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in full_state.items() if k.startswith("teacher.")}
    pth = tmp_path / "teacher.pth"
    torch.save({"model": teacher_state}, pth)

    args = reference_args(path_to_pretrained=str(pth),
                          alpha_teacher_student=alpha)
    torch.manual_seed(0)
    ref_ts = ref["teacherstudent"].CRWTeacherStudent(args)
    ref_ts.eval()
    tstate = {k: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in full_state.items()}
    missing, unexpected = ref_ts.load_state_dict(tstate, strict=False)
    assert not missing and not unexpected, (missing, unexpected)

    with torch.no_grad():
        _, loss_t, _ = ref_ts(xt)
    _, loss_j, _ = m.apply(variables, xj, train=False)
    np.testing.assert_allclose(float(loss_t), float(loss_j), rtol=1e-5)


def test_reference_pth_roundtrip_through_save_checkpoint(ref, tmp_path):
    """save_checkpoint's .pth loads into the reference via stock torch.load +
    load_state_dict — the full interop contract, not just the key mapping."""
    ref_model, m = _build_pair(ref)
    xj, xt = _patch_clip(seed=11)
    variables = m.init({"params": jax.random.PRNGKey(0)}, xj, train=False)
    pth = tmp_path / "model_0.pth"
    save_checkpoint(str(pth), variables, epoch=0, args={"temp": 0.05})
    ckpt = torch.load(str(pth), map_location="cpu", weights_only=False)
    missing, unexpected = ref_model.load_state_dict(ckpt["model"], strict=False)
    assert not missing and not unexpected, (missing, unexpected)
    with torch.no_grad():
        _, loss_t, _ = ref_model(xt, None, None)
    _, loss_j, _ = m.apply(variables, xj, train=False)
    np.testing.assert_allclose(float(loss_t), float(loss_j), rtol=1e-5)
