"""Encoder factory: model-type registry + 2D->3D time folding.

Mirrors the reference factory (code/utils/__init__.py:300-351) and `From3D`
(code/utils/__init__.py:285-297). Pretrained-checkpoint model types
(imagenet18/50, moco50, timecycle, uvc) are supported through the .pth import
shim in ``videowalk_tpu.utils.checkpoint`` when a local checkpoint file is
available (this environment has no network; the reference downloads them).

Layout: the framework is NHWC end-to-end (TPU-native). Video tensors are
``(B, T, H, W, C)``; `From3D` folds T into the batch axis — a free reshape in
XLA, versus the reference's permute+contiguous copy.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from videowalk_tpu.models.resnet import ResNet, resnet18, resnet50


class From3D(nn.Module):
    """Use a 2D convnet as a 3D convnet by folding time into batch.

    Reference: code/utils/__init__.py:285-297. Input ``(B, T, H, W, C)``;
    output ``(B, T, H', W', C')``.
    """

    model: nn.Module

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, T = x.shape[0], x.shape[1]
        xx = x.reshape(B * T, *x.shape[2:])
        m = self.model(xx, train=train)
        return m.reshape(B, T, *m.shape[1:])


@dataclasses.dataclass(frozen=True)
class EncoderSpec:
    """An encoder module plus its statically-known output geometry.

    Replaces the reference's runtime ``infer_dims`` dummy forward
    (code/model.py:40-45) — under XLA these are compile-time constants.
    """

    module: From3D
    hid_dim: int
    map_scale: int  # input px per output feature px (8 for the encoder default)
    model_type: str = "scratch"
    pretrained_path: str | None = None  # local ckpt consumed by init_params

    def init_params(self, rng: jax.Array, img_size: int = 256) -> dict:
        """Init encoder variables; import pretrained weights when the spec
        carries a checkpoint path (reference code/utils/__init__.py:300-351
        does this inside make_encoder; here params only exist post-init)."""
        dummy = jnp.zeros((1, 1, img_size, img_size, 3), jnp.float32)
        variables = self.module.init(rng, dummy, train=False)
        if self.pretrained_path:
            from videowalk_tpu.utils.pretrained import load_pretrained_state

            from videowalk_tpu.utils.checkpoint import partial_load

            state = load_pretrained_state(self.model_type,
                                          self.pretrained_path)
            # encoder-subtree variables: torch names have no tower prefix,
            # but the flax tree root is the From3D "model" scope
            new_vars = partial_load(
                {"model." + k: v for k, v in state.items()}, variables,
                verbose=False)
            # same nothing-matched guard as apply_pretrained_encoder: a
            # schema-drifted file that loads zero tensors must not hand the
            # caller random weights labeled 'pretrained'
            old = jax.tree_util.tree_leaves(variables)
            new = jax.tree_util.tree_leaves(new_vars)
            if all(np.array_equal(np.asarray(a), np.asarray(b))
                   for a, b in zip(old, new)):
                raise ValueError(
                    f"no encoder weights from {self.pretrained_path!r} "
                    f"matched the {self.model_type!r} trunk (wrong "
                    f"--model-type / corrupt file?)")
            variables = new_vars
        return variables


def _map_scale(trunk: ResNet) -> int:
    """Total spatial downscale: stem(2) * maxpool(2) * prod(stage strides)."""
    scale = 4
    for i, s in enumerate(trunk.stage_strides):
        if f"layer{i + 1}" not in trunk.remove_layers:
            scale *= s
    return scale


def make_encoder(
    model_type: str = "scratch",
    remove_layers: Sequence[str] = (),
    dtype: Any = jnp.float32,
    pretrained_path: str | None = None,
    remat: bool = False,
    remat_stages: str | None = None,
) -> EncoderSpec:
    """Build an encoder by reference model-type name.

    Supported (reference code/utils/__init__.py:300-351):
      scratch          ResNet-18, reflect padding, stride-1 layer3/4
      scratch_zeropad  ResNet-18, zero padding
      scratch50        ResNet-50, reflect padding
      imagenet18/50    ResNet-18/50, zero padding, ImageNet weights from
                       ``pretrained_path`` (.pth)
      moco50 / timecycle / uvc
                       ResNet-50/50/18 with weights imported from local
                       .pth/.pth.tar via the checkpoint shim
    (`r3d_18`/`r2plus1d_18` are dead in the reference — not constructible
    there either; see SURVEY.md §2 row 2.)
    """
    remove_layers = tuple(remove_layers)
    needs_ckpt = None
    if model_type == "scratch":
        trunk = resnet18("reflect", remove_layers, dtype=dtype, remat=remat,
                         remat_stages=remat_stages)
    elif model_type == "scratch_zeropad":
        trunk = resnet18("zeros", remove_layers, dtype=dtype, remat=remat,
                         remat_stages=remat_stages)
    elif model_type == "scratch50":
        trunk = resnet50("reflect", remove_layers, dtype=dtype, remat=remat,
                         remat_stages=remat_stages)
    elif model_type == "imagenet18":
        trunk = resnet18("zeros", remove_layers, dtype=dtype, remat=remat,
                         remat_stages=remat_stages)
        needs_ckpt = "imagenet resnet18 .pth"
    elif model_type in ("imagenet50", "moco50", "timecycle"):
        trunk = resnet50("zeros", remove_layers, dtype=dtype, remat=remat,
                         remat_stages=remat_stages)
        needs_ckpt = f"{model_type} .pth"
    elif model_type == "uvc":
        trunk = resnet18("zeros", remove_layers, dtype=dtype, remat=remat,
                         remat_stages=remat_stages)
        needs_ckpt = "uvc .pth.tar"
    else:
        raise ValueError(f"invalid model_type: {model_type!r}")

    # Construction is always allowed (weights live outside flax modules);
    # pretrained types WITHOUT a local checkpoint fail at weight-import time
    # with an actionable message (utils/pretrained.apply_pretrained_encoder).
    del needs_ckpt

    return EncoderSpec(
        module=From3D(model=trunk),
        hid_dim=trunk.hid_dim,
        map_scale=_map_scale(trunk),
        model_type=model_type,
        pretrained_path=pretrained_path,
    )
