"""Pure-functional CRW loss math (no parameters, no I/O).

Everything here is shape-static, jit-friendly, and differentiable. The
semantics mirror the PyTorch reference (file:line cites in each function), but
the implementation is TPU-first: stacked transition tensors, `lax.scan`
chains, and PRNG-keyed dropout instead of in-place mutation.
"""

from videowalk_tpu.core.walk import (
    EPS,
    affinity,
    zero_softmax,
    edge_dropout,
    stoch_mat,
    palindrome_products,
    palindrome_products_reference_assoc,
    xent_targets,
    walk_xent_loss,
    crw_walk_loss,
    sk_targets_walk_loss,
)
from videowalk_tpu.core.sinkhorn import sinkhorn_knopp
from videowalk_tpu.core.masks import radius_mask, make_dilation_kernel

__all__ = [
    "EPS",
    "affinity",
    "zero_softmax",
    "edge_dropout",
    "stoch_mat",
    "palindrome_products",
    "palindrome_products_reference_assoc",
    "xent_targets",
    "walk_xent_loss",
    "crw_walk_loss",
    "sk_targets_walk_loss",
    "sinkhorn_knopp",
    "radius_mask",
    "make_dilation_kernel",
]
