"""Model layer: flax encoders + CRW / teacher-student models.

Mirrors the reference's encoder surface (code/resnet.py, code/utils/__init__.py:300-351)
and model surface (code/model.py, code/teacherstudent.py), re-designed for
TPU/XLA: NHWC layouts, functional params, static shapes.
"""

from videowalk_tpu.models.resnet import ResNet, resnet18, resnet50
from videowalk_tpu.models.encoder import From3D, make_encoder, EncoderSpec
from videowalk_tpu.models.crw import CRW, CRWConfig
from videowalk_tpu.models.teacher_student import CRWTeacherStudent, soft_cross_entropy

__all__ = [
    "ResNet",
    "resnet18",
    "resnet50",
    "From3D",
    "make_encoder",
    "EncoderSpec",
    "CRW",
    "CRWConfig",
    "CRWTeacherStudent",
    "soft_cross_entropy",
]
