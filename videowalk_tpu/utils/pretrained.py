"""Pretrained-encoder weight import (reference model types).

The reference's ``make_encoder`` loads four families of published
checkpoints and munges their key schemas into torchvision-resnet names
(code/utils/__init__.py:248-351):

- ``imagenet18`` / ``imagenet50``: stock torchvision state_dicts downloaded
  by URL (code/resnet.py:57-63). Here the file must be local (zero egress).
- ``moco50``: MoCo-v2 ``.pth.tar`` — keep ``module.encoder_q.*`` keys, strip
  the prefix, partial-load (code/utils/__init__.py:319-324).
- ``timecycle``: TimeCycle ``.pth.tar`` — keep ``module.encoderVideo.*``,
  strip the prefix, and squeeze the singleton temporal axis of inflated 3D
  convs, (O, I, 1, kh, kw) -> (O, I, kh, kw) (``load_tc_model``,
  code/utils/__init__.py:254-270).
- ``uvc``: UVC ``.pth.tar`` — keep ``module.gray_encoder.*``, strip the
  prefix (``load_uvc_model``, code/utils/__init__.py:273-282).

Also provided: the VINCE schema (strip ``feature_extractor.module.model.``,
``load_vince_model`` code/utils/__init__.py:248-251 — defined but never
called by the reference; kept for checkpoint compatibility).

Output of every normalizer is a flat torchvision-resnet-named dict of numpy
arrays (``conv1.weight``, ``layer1.0.conv1.weight``, ``layer1.0.downsample.0
.weight``, ...). ``apply_pretrained_encoder`` prefixes those onto this
framework's encoder tower names and routes them through the .pth key shim
(``utils/checkpoint.py``), which transposes OIHW->HWIO and fills flax
params/batch_stats. Keys with no target (``fc.*``, MoCo's MLP head) are
skipped exactly like the reference's ``partial_load`` / ``modify()`` strip.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from videowalk_tpu.utils.checkpoint import load_checkpoint, partial_load

# model types whose encoders are initialized from a local checkpoint file
PRETRAINED_TYPES = ("imagenet18", "imagenet50", "moco50", "timecycle", "uvc")


def _to_numpy(v) -> np.ndarray:
    try:
        import torch

        if isinstance(v, torch.Tensor):
            return v.detach().cpu().numpy()
    except Exception:  # pragma: no cover
        pass
    return np.asarray(v)


def _unwrap_state_dict(ckpt: Mapping) -> Mapping[str, Any]:
    """Accept either a bare state_dict or a {state_dict|model: ...} wrapper."""
    for key in ("state_dict", "model"):
        inner = ckpt.get(key) if isinstance(ckpt, Mapping) else None
        if isinstance(inner, Mapping) and inner:
            return inner
    return ckpt


def normalize_imagenet(ckpt: Mapping) -> dict[str, np.ndarray]:
    """torchvision zoo file: already torchvision-named; strip any
    DataParallel ``module.`` prefix (code/resnet.py:57-63 loads it strict)."""
    state = _unwrap_state_dict(ckpt)
    return {k.removeprefix("module."): _to_numpy(v) for k, v in state.items()}


def normalize_moco(ckpt: Mapping) -> dict[str, np.ndarray]:
    """MoCo-v2: query-encoder subtree only (code/utils/__init__.py:319-324).

    The MLP projection head (``fc.0``/``fc.2``) survives normalization but
    has no target in the trunk, so the partial load skips it — identical to
    the reference's partial_load behavior.
    """
    state = _unwrap_state_dict(ckpt)
    prefix = "module.encoder_q."
    # split on the prefix, not a positional slice: a re-wrapped checkpoint
    # (e.g. 'model.module.encoder_q.conv1.weight') would otherwise pass the
    # substring filter but slice to garbage keys
    return {k.split(prefix, 1)[1]: _to_numpy(v) for k, v in state.items()
            if prefix in k}


def normalize_timecycle(ckpt: Mapping) -> dict[str, np.ndarray]:
    """TimeCycle: video-encoder subtree, inflated convs deflated.

    ``load_tc_model`` (code/utils/__init__.py:254-270) copies every
    ``module.encoderVideo.*`` tensor into a fresh resnet50, squeezing dim 2
    of 5D conv weights (the inflated temporal axis) when the target is 4D.
    """
    state = _unwrap_state_dict(ckpt)
    prefix = "module.encoderVideo."
    out = {}
    for k, v in state.items():
        if "encoderVideo" not in k:
            continue
        arr = _to_numpy(v)
        if arr.ndim == 5 and arr.shape[2] == 1:
            arr = arr.squeeze(2)
        out[k.replace(prefix, "")] = arr
    return out


def normalize_uvc(ckpt: Mapping) -> dict[str, np.ndarray]:
    """UVC: gray-encoder subtree (code/utils/__init__.py:273-282)."""
    state = _unwrap_state_dict(ckpt)
    prefix = "module.gray_encoder."
    return {k.replace(prefix, ""): _to_numpy(v) for k, v in state.items()
            if "gray_encoder" in k}


def normalize_vince(ckpt: Mapping) -> dict[str, np.ndarray]:
    """VINCE: feature-extractor subtree (code/utils/__init__.py:248-251)."""
    state = _unwrap_state_dict(ckpt)
    prefix = "feature_extractor.module.model."
    return {k.replace(prefix, ""): _to_numpy(v) for k, v in state.items()
            if "feature_extractor" in k}


_NORMALIZERS = {
    "imagenet18": normalize_imagenet,
    "imagenet50": normalize_imagenet,
    "moco50": normalize_moco,
    "timecycle": normalize_timecycle,
    "uvc": normalize_uvc,
    "vince": normalize_vince,
}


def load_pretrained_state(model_type: str, path: str) -> dict[str, np.ndarray]:
    """Read a local checkpoint file and normalize its key schema to
    torchvision-resnet names for ``model_type``."""
    if model_type not in _NORMALIZERS:
        raise ValueError(
            f"model_type {model_type!r} has no pretrained schema "
            f"(supported: {sorted(_NORMALIZERS)})")
    state = _NORMALIZERS[model_type](load_checkpoint(path))
    if not state:
        raise ValueError(
            f"{path} contains no keys matching the {model_type!r} schema "
            f"(see videowalk_tpu.utils.pretrained docstring)")
    return state


def apply_pretrained_encoder(
    variables: Mapping,
    model_type: str,
    path: str,
    verbose: bool = True,
) -> dict:
    """Import encoder weights from a local checkpoint into CRW variables.

    Applies to every encoder tower present in ``variables``: CRW's
    ``encoder`` and (for teacher-student, whose reference builds BOTH towers
    via ``make_encoder`` before overwriting the teacher from pretrained.pth,
    code/teacherstudent.py:316-328) ``student_encoder``/``teacher_encoder``.
    Returns new variables; raises if nothing matched.
    """
    if not path:
        raise ValueError(
            f"model_type={model_type!r} initializes its encoder from a "
            f"local checkpoint; pass --pretrained-path (the reference "
            f"downloads these at code/utils/__init__.py:313-330 — no "
            f"network access here)")
    state = load_pretrained_state(model_type, path)
    # torch-name prefixes of both tower layouts (utils/checkpoint._MODULE_MAP)
    tstate = {}
    for prefix in ("encoder.model.", "teacher.encoder.model."):
        tstate.update({prefix + k: v for k, v in state.items()})
    new_vars = partial_load(tstate, variables, verbose=verbose)
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            _leaves(variables), _leaves(new_vars)))
    if not changed:
        raise ValueError(
            f"no encoder weights from {path} matched the model "
            f"(wrong --model-type / corrupt file?)")
    return new_vars


def _leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)
