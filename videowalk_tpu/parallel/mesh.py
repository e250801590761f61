"""Device mesh construction and sharding helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (all, by default).

    Data parallelism is the reference's only parallel strategy
    (DataParallel, code/train.py:260-262); over ICI this is a single 'data'
    axis — gradients ride XLA's psum. In a multi-process cluster
    (parallel/multihost.py) ``jax.devices()`` is the GLOBAL device list, so
    the same mesh spans every host and the psum additionally crosses DCN.
    """
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def put_global(x, sharding: NamedSharding):
    """Place one host array onto a (possibly multi-process) sharding.

    Single process: a plain ``device_put``. Multi-process: ``x`` is this
    process's LOCAL block (its addressable shards' worth of rows for a
    batch-sharded spec; the full array for a replicated spec) and the
    result is the global ``jax.Array`` assembled across processes via
    ``jax.make_array_from_process_local_data`` — no data moves between
    hosts, each host feeds the chips it owns.
    """
    if jax.process_count() > 1 and not sharding.is_fully_addressable:
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            # already a global array (the prefetcher put it straight to the
            # mesh layout); fetching it back to host is impossible. Honor
            # the layout contract loudly instead of silently passing a
            # differently-sharded array through.
            if not x.sharding.is_equivalent_to(sharding, x.ndim):
                raise ValueError(
                    f"put_global got an already-global array sharded "
                    f"{x.sharding} but {sharding} was requested; reshard "
                    f"inside jit (or fix the producer's layout)")
            return x
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))
    # single process, or a process-local mesh inside a multi-process run
    # (e.g. eval's per-host --data-parallel mesh): a plain put
    return jax.device_put(x, sharding)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a pytree of host arrays on the mesh, sharded on the leading axis.

    Multi-process: each process passes its local batch block
    (global_batch / process_count rows); see ``put_global``.
    """
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(lambda x: put_global(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/state) across the mesh.

    Multi-process: every process passes the same full arrays (states are
    constructed deterministically from the shared seed), which become the
    replicated global arrays.
    """
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: put_global(x, sharding), tree)
