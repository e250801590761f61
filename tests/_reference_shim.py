"""Import shim for the actual PyTorch reference at /root/reference/code.

The round-1 test suite compared against torch oracles re-written inside the
tests; this shim lets tests import and run the *real* reference model
(code/model.py, code/teacherstudent.py) so parity is checked against the
genuine implementation, not a re-reading of it.

The reference depends on torchvision and scikit-image, which are not in this
image. The parity tests only exercise the model/loss path, so we provide:

- a minimal, state_dict-compatible ``torchvision.models.resnet`` (``ResNet``,
  ``BasicBlock``, ``Bottleneck``) written from the public architecture
  definition — module naming (conv1/bn1/layerX.Y/downsample.{0,1}/fc) matches
  stock torchvision so reference ``resnet.py`` subclasses it unchanged and
  checkpoints round-trip;
- empty placeholder modules for imports the model path never executes
  (``torchvision.transforms``, ``skimage``, the wandb/visdom-backed
  ``utils.visualize`` and PIL-heavy ``utils.augs``).

Nothing here is imported by the framework package itself — test-only.
"""

from __future__ import annotations

import sys
import types

REFERENCE_CODE = "/root/reference/code"

_cache: dict[str, types.ModuleType] = {}


def _build_torchvision_stub() -> types.ModuleType:
    import torch
    import torch.nn as nn

    def conv3x3(in_planes, out_planes, stride=1):
        return nn.Conv2d(in_planes, out_planes, kernel_size=3, stride=stride,
                         padding=1, bias=False)

    def conv1x1(in_planes, out_planes, stride=1):
        return nn.Conv2d(in_planes, out_planes, kernel_size=1, stride=stride,
                         bias=False)

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     groups=1, base_width=64, dilation=1, norm_layer=None):
            super().__init__()
            norm_layer = norm_layer or nn.BatchNorm2d
            self.conv1 = conv3x3(inplanes, planes, stride)
            self.bn1 = norm_layer(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = conv3x3(planes, planes)
            self.bn2 = norm_layer(planes)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     groups=1, base_width=64, dilation=1, norm_layer=None):
            super().__init__()
            norm_layer = norm_layer or nn.BatchNorm2d
            width = int(planes * (base_width / 64.0)) * groups
            self.conv1 = conv1x1(inplanes, width)
            self.bn1 = norm_layer(width)
            self.conv2 = conv3x3(width, width, stride)
            self.bn2 = norm_layer(width)
            self.conv3 = conv1x1(width, planes * self.expansion)
            self.bn3 = norm_layer(planes * self.expansion)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(nn.Module):
        def __init__(self, block, layers, num_classes=1000,
                     zero_init_residual=False, groups=1, width_per_group=64,
                     replace_stride_with_dilation=None, norm_layer=None):
            super().__init__()
            self._norm_layer = norm_layer or nn.BatchNorm2d
            self.inplanes = 64
            self.groups = groups
            self.base_width = width_per_group
            self.conv1 = nn.Conv2d(3, 64, kernel_size=7, stride=2, padding=3,
                                   bias=False)
            self.bn1 = self._norm_layer(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(kernel_size=3, stride=2, padding=1)
            self.layer1 = self._make_layer(block, 64, layers[0])
            self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
            self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
            self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512 * block.expansion, num_classes)

        def _make_layer(self, block, planes, blocks, stride=1):
            norm_layer = self._norm_layer
            downsample = None
            if stride != 1 or self.inplanes != planes * block.expansion:
                downsample = nn.Sequential(
                    conv1x1(self.inplanes, planes * block.expansion, stride),
                    norm_layer(planes * block.expansion),
                )
            layers = [block(self.inplanes, planes, stride, downsample,
                            self.groups, self.base_width,
                            norm_layer=norm_layer)]
            self.inplanes = planes * block.expansion
            for _ in range(1, blocks):
                layers.append(block(self.inplanes, planes, groups=self.groups,
                                    base_width=self.base_width,
                                    norm_layer=norm_layer))
            return nn.Sequential(*layers)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer1(x)
            x = self.layer2(x)
            x = self.layer3(x)
            x = self.layer4(x)
            x = torch.flatten(self.avgpool(x), 1)
            return self.fc(x)

    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_resnet = types.ModuleType("torchvision.models.resnet")
    tv_resnet.ResNet = ResNet
    tv_resnet.BasicBlock = BasicBlock
    tv_resnet.Bottleneck = Bottleneck
    tv_resnet.conv3x3 = conv3x3
    tv_resnet.conv1x1 = conv1x1
    tv_transforms = types.ModuleType("torchvision.transforms")
    tv_models.resnet = tv_resnet
    tv.models = tv_models
    tv.transforms = tv_transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models
    sys.modules["torchvision.models.resnet"] = tv_resnet
    sys.modules["torchvision.transforms"] = tv_transforms
    return tv


def _stub_module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def load_reference():
    """Import the reference's model/teacherstudent/utils against the stubs.

    Returns a dict of modules: {"model", "teacherstudent", "utils", "resnet"}.
    Safe to call repeatedly (cached). Leaves sys.path untouched on exit; the
    reference's top-level module names (utils/model/resnet) stay in
    sys.modules, which nothing in this repo collides with.
    """
    if _cache:
        return dict(_cache)

    if "torchvision" not in sys.modules:
        _build_torchvision_stub()
    if "skimage" not in sys.modules:
        sk = _stub_module("skimage")
        sk_util = _stub_module("skimage.util", img_as_float=lambda x: x)
        sk.util = sk_util
    # The model path never calls into the reference's visualization or PIL
    # augmentation modules; pre-seed them so `from . import visualize` in
    # utils/__init__.py (code/utils/__init__.py:16-17) resolves to stubs
    # instead of importing wandb/visdom/PIL.
    _stub_module("utils.visualize", vis_adj=None)
    _stub_module("utils.augs")

    sys.path.insert(0, REFERENCE_CODE)
    try:
        import resnet as ref_resnet  # noqa: F401
        import utils as ref_utils  # noqa: F401
        import model as ref_model  # noqa: F401
        import teacherstudent as ref_ts  # noqa: F401
    finally:
        sys.path.remove(REFERENCE_CODE)

    _cache.update(model=ref_model, teacherstudent=ref_ts,
                  utils=ref_utils, resnet=ref_resnet)
    return dict(_cache)


def reference_args(**overrides):
    """An argparse-style namespace with the fields CRW/CRWTeacherStudent read
    (code/model.py:14-38, code/teacherstudent.py:294-340)."""
    import argparse

    ns = argparse.Namespace(
        device="cpu",
        model_type="scratch",
        remove_layers=[],
        head_depth=0,
        temp=0.05,
        dropout=0.0,
        featdrop=0.0,
        flip=False,
        sk_targets=False,
        dilate_superpixels=False,
        dilation_kernel_size=51,
        dilation_kernel_shape="L1",
    )
    for k, v in overrides.items():
        setattr(ns, k, v)
    return ns
