"""Subprocess worker for tests/test_multihost.py.

Runs one of two processes of a real ``jax.distributed`` CPU cluster (gloo
collectives), trains 3 CRW steps on a 4-device global mesh (2 local devices
per process), and dumps losses + a param leaf for the parent to compare
against the single-process mesh result.

Usage: python _multihost_worker.py <rank> <port> <outdir>
"""

import os
import sys


def main():
    rank, port, outdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    # Same mechanism as conftest: the env var alone is shadowed by injected
    # TPU PJRT plugins, only the config API reliably pins the backend.
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from videowalk_tpu.parallel import (create_train_state,
                                        initialize_distributed, is_primary,
                                        make_mesh, make_optimizer,
                                        make_train_step, replicate,
                                        shard_batch)

    initialize_distributed(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=rank)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 2, jax.local_devices()
    assert len(jax.devices()) == 4, jax.devices()

    import jax.numpy as jnp

    from videowalk_tpu.models import CRW, CRWConfig

    # layer1-only encoder: the cheap-compile representative used by the
    # default-tier mesh-parity test (test_train_and_checkpoint.py)
    cfg = CRWConfig(model_type="scratch_zeropad", temperature=0.05,
                    remove_layers=("layer2", "layer3", "layer4"))
    model = CRW(cfg)
    # SGD, not Adam: the parity assertion against the single-process mesh
    # wants updates LINEAR in the gradient sum — Adam's m/sqrt(v) amplifies
    # benign float32 reduction-order differences (gloo vs in-process) into
    # percent-level param drift within 3 steps.
    optimizer = make_optimizer(lr=1e-2, optim="sgd")

    host_rng = np.random.RandomState(0)
    global_batch = host_rng.randn(4, 3, 4, 32, 32, 3).astype(np.float32)
    local = global_batch[rank * 2:(rank + 1) * 2]  # this process's block

    state = create_train_state(model, optimizer,
                               jnp.asarray(global_batch[:1]),
                               jax.random.PRNGKey(0))
    mesh = make_mesh()
    state = replicate(state, mesh)
    step = make_train_step(model, optimizer, donate=False)

    losses = []
    for i in range(3):
        batch = shard_batch(local, mesh)
        state, metrics = step(state, batch, jax.random.PRNGKey(42 + i))
        losses.append(float(metrics["loss"]))

    leaf = np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(state.params)[0]))
    np.savez(os.path.join(outdir, f"rank{rank}.npz"),
             losses=np.asarray(losses), leaf=leaf,
             primary=np.asarray(bool(is_primary())))
    print("WORKER_OK", rank, flush=True)


if __name__ == "__main__":
    main()
