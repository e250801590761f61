"""flax ResNet-18/50 encoder with the reference's `modify()` semantics.

Functional re-design of the reference's torchvision subclass
(code/resnet.py:17-73):

- ``modify(remove_layers=..., padding=...)`` is not mutation here — the same
  knobs are constructor fields (`strides`, `padding_mode`, `remove_layers`),
  since flax modules are immutable pytree definitions.
- stride-1 layer3/4 (code/resnet.py:21-29): every conv in those stages gets
  stride 1, including the 1x1 projection, so 256^2 inputs yield 32x32 maps.
- reflect padding (code/resnet.py:30-36): all spatially-padded convs switch to
  reflect; implemented as an explicit `jnp.pad(mode='reflect')` + VALID conv,
  which XLA fuses into the conv HLO.
- `fc`/`avgpool` never exist (always stripped in the reference,
  code/resnet.py:38-41); `remove_layers` drops whole stages (the reference's
  test config removes `layer4`, code/utils/arguments.py:59-60).

TPU-first choices: NHWC layout (TPU-native), bf16-capable compute dtype with
f32 params/batch-stats, BatchNorm with torch-matching eps/momentum so .pth
checkpoints round-trip bit-exactly.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

# torch BatchNorm2d defaults: eps=1e-5, momentum=0.1 (i.e. running stats decay
# 0.9). flax's `momentum` is the decay factor itself.
BN_EPS = 1e-5
BN_MOMENTUM = 0.9


def _pad_conv(
    x: jax.Array,
    features: int,
    kernel: int,
    stride: int,
    padding: int,
    padding_mode: str,
    name: str,
    dtype=jnp.float32,
) -> jax.Array:
    """Conv2D with torch-style explicit padding (zeros or reflect).

    All convs go through PadConv (per-call padding, CPU im2col lowering for
    small maps — ops/reflect_conv.py). Reflect padding cannot be expressed
    in the conv op itself: the default path is an explicit reflect pad
    (scatter-free VJP, ops/reflect_pad.py) + VALID conv; the exact
    zero-SAME + boundary-strip rewrite is available via
    VIDEOWALK_REFLECT_FUSE=always (measured neutral on v5e — see
    ops/reflect_conv.py).
    """
    from videowalk_tpu.ops.reflect_conv import PadConv, reflect_conv2d

    conv = PadConv(features, kernel, stride, dtype=dtype, name=name)
    if padding > 0 and padding_mode == "reflect":
        return reflect_conv2d(x, conv, kernel, stride, padding)
    if padding > 0:
        return conv(x, [(padding, padding), (padding, padding)])
    return conv(x, "VALID")


def _batch_norm(x, train: bool, name: str, dtype=jnp.float32):
    """BatchNorm2d with torch defaults (eps/momentum), named for .pth keys."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=dtype, name=name)(x)


class FusedStatsBN(nn.Module):
    """Training-mode BatchNorm consuming precomputed batch moments.

    Pairs with the Pallas reflect-conv's fused-stats mode
    (ops/rconv_kernel.py::reflect_conv3x3_stats): the conv kernel reduces
    ``s1 = sum(y)`` / ``s2 = sum(y*y)`` per channel in VMEM while the
    activation is resident, so this module never re-reads the activation
    for the reduction — only the elementwise normalize remains.

    Exact clone of ``flax.linen.BatchNorm``'s training semantics on the
    same cast values: f32 moments, fast-variance ``max(0, E[y^2]-E[y]^2)``
    clip, ``momentum * ra + (1 - momentum) * batch`` running updates
    (skipped at init), and ``(x - mean) * (rsqrt(var+eps) * scale) + bias``
    in f32 cast back to ``dtype`` — flax's ``_normalize`` op order. Param /
    variable names match ``nn.BatchNorm`` ("scale"/"bias" params,
    batch_stats "mean"/"var"), so .pth checkpoint mapping
    (utils/checkpoint.py) and the unfused eval path share state untouched.

    Reference analogue: BN-after-every-conv in the torchvision BasicBlock
    the reference builds on (/root/reference/code/resnet.py:8-9).
    """

    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, s1, s2, count: int):
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (feat,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (feat,))
        mean = s1 / count
        var = jnp.maximum(0.0, s2 / count - mean * mean)
        if not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1 - self.momentum) * var)
        scale = self.param("scale", nn.initializers.ones, (feat,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)
        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x - mean) * mul + bias          # x promotes to f32 via mean
        return jnp.asarray(y, self.dtype)


class BNAffine(nn.Module):
    """Train-mode BatchNorm reduced to its per-channel affine ``(a, b)``.

    The normalize ``(y - mean) * rsqrt(var+eps) * scale + bias`` is
    ``a*y + b`` with ``a = scale * rsqrt(var+eps)``, ``b = bias - mean*a``;
    this module computes the batch moments (from fused kernel moments when
    given, else a flax-formula XLA reduce), updates the running statistics
    exactly like ``nn.BatchNorm`` (same param/variable names — .pth mapping
    and the eval path share state untouched), and returns ``(a, b)`` f32 so
    the CONSUMER applies normalize(+relu) inside its own kernel
    (ops/rconv_kernel.py::reflect_conv3x3_bnin_stats): the normalized
    activation never exists in HBM. BN parameter/statistic gradients come
    from jax autodiff of these two per-channel scalars.
    """

    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS

    @nn.compact
    def __call__(self, y, moments=None):
        feat = y.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (feat,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (feat,))
        count = y.shape[0] * y.shape[1] * y.shape[2]
        if moments is not None:
            s1, s2 = moments
            mean = s1 / count
            var = jnp.maximum(0.0, s2 / count - mean * mean)
        else:
            yf = y.astype(jnp.float32)
            mean = jnp.mean(yf, (0, 1, 2))
            var = jnp.maximum(0.0, jnp.mean(yf * yf, (0, 1, 2))
                              - mean * mean)
        if not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1 - self.momentum) * var)
        scale = self.param("scale", nn.initializers.ones, (feat,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)
        a = jax.lax.rsqrt(var + self.epsilon) * scale
        return a, bias - mean * a


def _bn_fuse_mode() -> str:
    """VIDEOWALK_BN_FUSE: auto (default; moment fold + input-affine fold
    wherever the rconv kernel is live) | stats (moment fold only — phase-1
    A/B point) | off (A/B kill switch — the unfused XLA BN path).
    Trace-time."""
    import os

    mode = os.environ.get("VIDEOWALK_BN_FUSE", "auto")
    if mode not in ("auto", "stats", "off"):
        raise ValueError(
            f"VIDEOWALK_BN_FUSE={mode!r}: want auto | stats | off")
    return mode


def _bn_fuse_on() -> bool:
    return _bn_fuse_mode() != "off"


def _conv_moments(x, features: int, kernel: int, stride: int, padding: int,
                  padding_mode: str, conv_name: str, train: bool,
                  dtype=jnp.float32):
    """Raw conv output + optional fused batch moments.

    The kernel-with-stats path when the Pallas kernel is live for THIS
    conv's geometry; otherwise the plain conv with ``moments=None`` (the
    consumer's BNAffine reduces via XLA — the input-affine fold downstream
    still removes the normalize write+read)."""
    from videowalk_tpu.ops.reflect_conv import PadConv, rconv_kernel_routes

    if (kernel == 3 and stride == 1 and padding == 1
            and padding_mode == "reflect"
            and rconv_kernel_routes(x.shape[1], x.shape[2], x.shape[-1],
                                    features, kernel, stride, padding)):
        conv = PadConv(features, kernel, stride, dtype=dtype, name=conv_name)
        y, s1, s2 = conv(x, "REFLECT_KERNEL_STATS")
        return y, (s1, s2)
    y = _pad_conv(x, features, kernel, stride, padding, padding_mode,
                  conv_name, dtype)
    return y, None


def _conv_bn(x, features: int, kernel: int, stride: int, padding: int,
             padding_mode: str, conv_name: str, bn_name: str, train: bool,
             dtype=jnp.float32):
    """Conv + BatchNorm pair, fusing the BN moment reduction into the
    Pallas reflect-conv kernel where that kernel is live.

    Fusion conditions: train mode (eval BN uses running stats — no
    reduction to fuse), reflect padding, the shared
    ``rconv_kernel_routes`` gate (so the _STATS mode is requested exactly
    where reflect_conv2d would pick the kernel anyway), and
    VIDEOWALK_BN_FUSE != off. Everything else takes the standard
    ``_pad_conv`` + ``_batch_norm`` path.

    Multi-chip note: the fused moments are per-pallas-call sums; under a
    sharded batch they would be per-shard, unlike flax BN's global-mean
    SPMD semantics. The gate inherits rconv_kernel_routes's backend==tpu
    condition, and the Pallas kernels are single-chip paths today (the
    8-device mesh tests run the XLA path on CPU) — revisit together with
    kernel sharding if multi-chip hardware lands.
    """
    from videowalk_tpu.ops.reflect_conv import PadConv, rconv_kernel_routes

    fuse = (train and kernel == 3 and stride == 1 and padding == 1
            and padding_mode == "reflect" and _bn_fuse_on()
            and rconv_kernel_routes(x.shape[1], x.shape[2], x.shape[-1],
                                    features, kernel, stride, padding))
    if fuse:
        conv = PadConv(features, kernel, stride, dtype=dtype, name=conv_name)
        y, s1, s2 = conv(x, "REFLECT_KERNEL_STATS")
        count = y.shape[0] * y.shape[1] * y.shape[2]
        return FusedStatsBN(momentum=BN_MOMENTUM, epsilon=BN_EPS,
                            dtype=dtype, name=bn_name)(y, s1, s2, count)
    y = _pad_conv(x, features, kernel, stride, padding, padding_mode,
                  conv_name, dtype)
    return _batch_norm(y, train, bn_name, dtype)


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity/projection shortcut (ResNet-18/34 block).

    Mirrors torchvision BasicBlock semantics as used by the reference
    (code/resnet.py:8-9 imports it from torchvision).
    """

    filters: int
    stride: int = 1
    padding_mode: str = "zeros"
    use_projection: bool = False
    dtype: jnp.dtype = jnp.float32

    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        # Fused conv1->bn1->relu->conv2->bn2 chain (train, reflect, conv2
        # kernel-routed, VIDEOWALK_BN_FUSE=auto): conv1's RAW output flows
        # straight into conv2's kernel, which applies bn1's affine + relu
        # in VMEM (reflect_conv3x3_bnin_stats) — the normalized activation
        # never exists in HBM — and emits bn2's moments for free.
        h2 = (x.shape[1] + 2 - 3) // self.stride + 1
        w2 = (x.shape[2] + 2 - 3) // self.stride + 1
        from videowalk_tpu.ops.reflect_conv import (PadConv,
                                                    rconv_kernel_routes)

        chain = (train and self.padding_mode == "reflect"
                 and _bn_fuse_mode() == "auto"
                 and rconv_kernel_routes(h2, w2, self.filters,
                                         self.filters, 3, 1, 1))
        if chain:
            y1, moments = _conv_moments(
                x, self.filters, 3, self.stride, 1, self.padding_mode,
                "conv1", train, self.dtype)
            a1, b1 = BNAffine(momentum=BN_MOMENTUM, epsilon=BN_EPS,
                              name="bn1")(y1, moments)
            conv2 = PadConv(self.filters, 3, 1, dtype=self.dtype,
                            name="conv2")
            y, s1, s2 = conv2(y1, "REFLECT_KERNEL_BNIN_STATS",
                              bn_affine=(a1, b1))
            count = y.shape[0] * y.shape[1] * y.shape[2]
            y = FusedStatsBN(momentum=BN_MOMENTUM, epsilon=BN_EPS,
                             dtype=self.dtype, name="bn2")(y, s1, s2, count)
        else:
            y = _conv_bn(x, self.filters, 3, self.stride, 1,
                         self.padding_mode, "conv1", "bn1", train,
                         self.dtype)
            y = nn.relu(y)
            y = _conv_bn(y, self.filters, 3, 1, 1, self.padding_mode,
                         "conv2", "bn2", train, self.dtype)
        if self.use_projection:
            residual = _pad_conv(x, self.filters, 1, self.stride, 0,
                                 self.padding_mode, "downsample_conv",
                                 self.dtype)
            residual = _batch_norm(residual, train, "downsample_bn", self.dtype)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck (ResNet-50 block), torchvision semantics
    (stride on the 3x3, expansion 4)."""

    filters: int
    stride: int = 1
    padding_mode: str = "zeros"
    use_projection: bool = False
    dtype: jnp.dtype = jnp.float32

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = _pad_conv(x, self.filters, 1, 1, 0, self.padding_mode,
                      "conv1", self.dtype)
        y = _batch_norm(y, train, "bn1", self.dtype)
        y = nn.relu(y)
        y = _conv_bn(y, self.filters, 3, self.stride, 1, self.padding_mode,
                     "conv2", "bn2", train, self.dtype)
        y = nn.relu(y)
        y = _pad_conv(y, self.filters * 4, 1, 1, 0, self.padding_mode,
                      "conv3", self.dtype)
        y = _batch_norm(y, train, "bn3", self.dtype)
        if self.use_projection:
            residual = _pad_conv(x, self.filters * 4, 1, self.stride, 0,
                                 self.padding_mode, "downsample_conv",
                                 self.dtype)
            residual = _batch_norm(residual, train, "downsample_bn", self.dtype)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet encoder trunk (stem + 4 stages, no fc/avgpool).

    Args mirror the reference's post-`modify()` state (code/resnet.py:21-54):

    - ``stage_strides``: per-stage first-block stride. The encoder default
      ``(1, 2, 1, 1)`` is torchvision's ``(1, 2, 2, 2)`` after `modify()`
      sets layer3/4 stride to 1.
    - ``padding_mode``: 'zeros' | 'reflect'.
    - ``remove_layers``: stage names to drop entirely ('layer1'..'layer4').

    Input/Output: NHWC. 256x256 input -> 32x32 map (map_scale 8) with the
    encoder defaults, matching the reference's infer_dims (code/model.py:40-45).
    """

    block_cls: type = BasicBlock
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    stage_strides: Sequence[int] = (1, 2, 1, 1)
    padding_mode: str = "zeros"
    remove_layers: Sequence[str] = ()
    dtype: jnp.dtype = jnp.float32
    # Rematerialize blocks in the backward pass (jax.checkpoint): trades
    # ~30% more FLOPs for O(depth) less activation memory — needed for the
    # reference's large-activation regime (stride-1 layer3/4 keep 32x32
    # maps at 256^2 inputs; SURVEY.md §7 hard parts).
    remat: bool = False
    # Selective remat: which stages to rematerialize when `remat` is on.
    # "" / "all" = every stage (full remat, the safe default). A comma list
    # like "layer1,layer2,layer3" remats only the listed stages — stages
    # NOT listed keep their interior activations stored. Recompute cost is
    # ~proportional to a stage's fwd FLOPs while its memory cost is its
    # interior activation bytes, and at the modified-resnet18 geometry that
    # ratio is lopsided: layer4 is ~72% of the recompute FLOPs but stores
    # the same 8x8 maps as layer3 — so "layer1,layer2,layer3" (keep layer4
    # stored) cuts remat overhead ~33%->~9% when the extra bytes fit.
    # Env override VIDEOWALK_REMAT_STAGES (trace-time, like
    # VIDEOWALK_RCONV_MIN_C) applies when this field is None.
    remat_stages: str | None = None

    @property
    def hid_dim(self) -> int:
        """Output channel count (reference CRW.infer_dims, code/model.py:40-45)."""
        widths = [64, 128, 256, 512]
        kept = [i for i in range(4) if f"layer{i + 1}" not in self.remove_layers]
        last = kept[-1] if kept else None
        if last is None:
            return 64
        return widths[last] * self.block_cls.expansion

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Stem: 7x7/2 conv + BN + relu + 3x3/2 maxpool (torchvision).
        x = _pad_conv(x, 64, 7, 2, 3, self.padding_mode, "conv1", self.dtype)
        x = _batch_norm(x, train, "bn1", self.dtype)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        widths = [64, 128, 256, 512]
        in_features = 64
        for stage in range(4):
            name = f"layer{stage + 1}"
            if name in self.remove_layers:
                continue
            filters = widths[stage]
            out_features = filters * self.block_cls.expansion
            block_cls = self.block_cls
            if self.remat and name in _remat_stage_set(self.remat_stages):
                block_cls = nn.remat(self.block_cls,
                                     static_argnums=(2,))
            for blk in range(self.stage_sizes[stage]):
                stride = self.stage_strides[stage] if blk == 0 else 1
                use_projection = (stride != 1) or (in_features != out_features)
                x = block_cls(
                    filters=filters, stride=stride,
                    padding_mode=self.padding_mode,
                    use_projection=use_projection,
                    dtype=self.dtype,
                    name=f"{name}_{blk}")(x, train)
                in_features = out_features
        return x


_ALL_STAGES = frozenset({"layer1", "layer2", "layer3", "layer4"})


def _remat_stage_set(remat_stages: str | None) -> frozenset:
    """Resolve the selective-remat stage set (see ResNet.remat_stages).

    None defers to the trace-time env knob VIDEOWALK_REMAT_STAGES;
    ""/"all" means every stage. Unknown stage names are rejected loudly —
    a typo here would silently buy no memory and cost full recompute.
    """
    import os

    if remat_stages is None:
        remat_stages = os.environ.get("VIDEOWALK_REMAT_STAGES", "all")
    if remat_stages in ("", "all"):
        return _ALL_STAGES
    stages = frozenset(s.strip() for s in remat_stages.split(",") if s.strip())
    bad = stages - _ALL_STAGES
    if bad:
        raise ValueError(
            f"remat_stages contains unknown stage(s) {sorted(bad)}; "
            f"valid: {sorted(_ALL_STAGES)} or 'all'")
    return stages


def _encoder_strides(modify_stride: bool) -> tuple[int, int, int, int]:
    """torchvision strides (1,2,2,2); `modify()` flattens layer3/4 to 1."""
    return (1, 2, 1, 1) if modify_stride else (1, 2, 2, 2)


def resnet18(
    padding_mode: str = "zeros",
    remove_layers: Sequence[str] = (),
    modify_stride: bool = True,
    dtype=jnp.float32,
    remat: bool = False,
    remat_stages: str | None = None,
) -> ResNet:
    """ResNet-18 trunk (reference ctor code/resnet.py:66-68 + modify)."""
    return ResNet(
        block_cls=BasicBlock, stage_sizes=(2, 2, 2, 2),
        stage_strides=_encoder_strides(modify_stride),
        padding_mode=padding_mode, remove_layers=tuple(remove_layers),
        dtype=dtype, remat=remat, remat_stages=remat_stages)


def resnet50(
    padding_mode: str = "zeros",
    remove_layers: Sequence[str] = (),
    modify_stride: bool = True,
    dtype=jnp.float32,
    remat: bool = False,
    remat_stages: str | None = None,
) -> ResNet:
    """ResNet-50 trunk (reference ctor code/resnet.py:71-73 + modify)."""
    return ResNet(
        block_cls=Bottleneck, stage_sizes=(3, 4, 6, 3),
        stage_strides=_encoder_strides(modify_stride),
        padding_mode=padding_mode, remove_layers=tuple(remove_layers),
        dtype=dtype, remat=remat, remat_stages=remat_stages)
