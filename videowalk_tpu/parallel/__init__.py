"""SPMD parallelism over the TPU ICI mesh.

Replaces the reference's single-process ``torch.nn.DataParallel``
(code/train.py:260-262) — the only multi-device mechanism in the reference
(SURVEY.md §2 parallelism table) — with jit-over-Mesh data parallelism:
the batch is sharded over the 'data' axis, params are replicated, and XLA
inserts the gradient psum over ICI. BatchNorm statistics are computed over
the *global* batch under jit (stronger than DataParallel's per-replica stats).
"""

from videowalk_tpu.parallel.mesh import (make_mesh, put_global, replicate,
                                         shard_batch)
from videowalk_tpu.parallel.multihost import (initialize_distributed,
                                              initialize_from_args,
                                              is_primary)
from videowalk_tpu.parallel.train_step import (
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
    multistep_lr,
)

__all__ = [
    "make_mesh",
    "put_global",
    "shard_batch",
    "replicate",
    "initialize_distributed",
    "initialize_from_args",
    "is_primary",
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_train_step",
    "multistep_lr",
]
