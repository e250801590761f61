"""Multi-process (multi-host) SPMD initialization.

The reference's only multi-device mechanism is single-process
``torch.nn.DataParallel`` (code/train.py:260-262); its ``torch.distributed``
meter hooks are dead code (code/utils/__init__.py:65-78 — no
init_process_group anywhere). This module is the TPU-native superset: one
Python process per host, all hosts joined through JAX's distributed runtime,
one global device Mesh spanning every chip. Gradients still ride the same
XLA psum as the single-process mesh — over ICI within a slice and DCN across
hosts — with zero hand-written collectives.

Deployment contract (standard JAX multi-controller SPMD):
- every process runs the SAME program (same flags, same seed);
- host-side RNG draws that steer control flow (the per-step patch-vs-
  superpixel Bernoulli, stochastic-checkpoint coin) are seeded identically,
  so all processes always compile+dispatch the same step function;
- the DATA differs per process: each loads ``global_batch / process_count``
  clips from a disjoint sampler shard (``DataLoader(shard=(rank, world))``)
  and contributes them as its process-local block of the globally sharded
  batch array (``jax.make_array_from_process_local_data`` in
  ``parallel.mesh.put_global``);
- only process 0 writes checkpoints.

On CPU (tests) the cross-process collectives run over gloo — the 2-process
suite test drives this for real, pinned against the single-process mesh.
"""

from __future__ import annotations

import jax


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           local_device_ids=None) -> int:
    """Join (or form) a multi-process JAX cluster; returns process_count.

    With no arguments this defers to ``jax.distributed.initialize()``'s
    auto-detection (TPU pod metadata, SLURM, ...). Explicit arguments are
    for manual clusters and the CPU-backend tests. Must run before the
    first backend query (``jax.devices()``); calling it in an
    already-initialized single-process session raises.
    """
    # CPU backend: cross-process collectives need a transport; gloo is the
    # in-tree default. Harmless on TPU (the flag only affects XLA:CPU).
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception as e:
        # don't swallow silently: on a CPU cluster a missing transport
        # means the FIRST collective hangs with no diagnostic
        import warnings

        warnings.warn(
            f"could not select the gloo CPU collectives transport ({e}); "
            f"multi-process CPU collectives may hang", RuntimeWarning)
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None and num_processes > 0:
        kwargs["num_processes"] = num_processes
    if process_id is not None and process_id >= 0:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    return jax.process_count()


def initialize_from_args(args) -> int:
    """CLI hook: ``--distributed [--coordinator-address ... --num-processes
    N --process-id I]``. Returns process_count (1 = single process)."""
    if not getattr(args, "distributed", False):
        return jax.process_count()
    return initialize_distributed(
        coordinator_address=getattr(args, "coordinator_address", "") or None,
        num_processes=getattr(args, "num_processes", 0) or None,
        process_id=(getattr(args, "process_id", -1)
                    if getattr(args, "process_id", -1) >= 0 else None))


def is_primary() -> bool:
    """True on the one process that owns checkpoint/artifact writes."""
    return jax.process_index() == 0
