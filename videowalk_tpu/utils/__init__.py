"""Utilities: meters, checkpointing, argument surface.

Mirrors the reference's ``code/utils/__init__.py`` utility layer (meters,
partial_load) minus the model/ops code, which lives in core/ and models/.
"""

from videowalk_tpu.utils.meters import SmoothedValue, MetricLogger
from videowalk_tpu.utils.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    partial_load,
    flax_to_torch_state,
    torch_to_flax_state,
)

__all__ = [
    "SmoothedValue",
    "MetricLogger",
    "save_checkpoint",
    "load_checkpoint",
    "partial_load",
    "flax_to_torch_state",
    "torch_to_flax_state",
]
