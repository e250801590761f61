"""Evaluation: label propagation, prediction dumping, DAVIS/JHMDB/VIP metrics.

Mirrors the reference's evaluation surface: code/test.py (propagation),
code/utils/test_utils.py (context bank, batched affinity, dumping),
code/eval/ (DAVIS converter, PCK, VIP mIoU, sweep runner). DAVIS J&F is
computed in-repo (videowalk_tpu/eval/davis_metrics.py) rather than by the
external davis2017-evaluation checkout the reference shells out to
(Dockerfile:19-20, test.sh:30-32).
"""

from videowalk_tpu.eval.propagation import (
    context_index_bank,
    propagate_labels,
    topk_affinity,
)

__all__ = ["context_index_bank", "propagate_labels", "topk_affinity"]
