"""Multi-process (multi-host) SPMD training, driven for real on CPU.

Two subprocesses form a genuine ``jax.distributed`` cluster (gloo CPU
collectives, 2 local devices each -> 4-device global mesh) and train 3 CRW
steps; the result is pinned against the single-process 4-device mesh on the
same global batch. This is the DCN-scale analogue the reference never had
(its torch.distributed hooks are dead code, code/utils/__init__.py:65-78).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                        f"{n_local_devices}")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the workers pin the cpu backend via the config API themselves (the
    # env var alone is shadowed by injected TPU PJRT plugins)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _run_pair(cmd_for_rank, env, tmp_path, timeout=900):
    procs, logs = [], []
    try:
        for rank in (0, 1):
            log = open(os.path.join(str(tmp_path), f"proc{rank}.log"), "w+")
            logs.append(log)
            procs.append(subprocess.Popen(
                cmd_for_rank(rank), env=env, stdout=log,
                stderr=subprocess.STDOUT, cwd=REPO))
        codes = [p.wait(timeout=timeout) for p in procs]
    finally:
        # a hung/failed pair must not outlive the test: two leaked workers
        # thrash every later test on this 1-core host
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait(timeout=30)
        outs = []
        for log in logs:
            log.seek(0)
            outs.append(log.read())
            log.close()
    for rank, (code, out) in enumerate(zip(codes, outs)):
        assert code == 0, f"rank {rank} exited {code}:\n{out[-4000:]}"
    return outs


def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    _run_pair(
        lambda rank: [sys.executable, WORKER, str(rank), str(port),
                      str(tmp_path)],
        _worker_env(2), tmp_path)

    r0 = np.load(tmp_path / "rank0.npz")
    r1 = np.load(tmp_path / "rank1.npz")
    # both processes observe the identical replicated state
    np.testing.assert_array_equal(r0["losses"], r1["losses"])
    np.testing.assert_array_equal(r0["leaf"], r1["leaf"])
    assert bool(r0["primary"]) and not bool(r1["primary"])

    # single-process reference: same model/state/batch on a 4-device mesh
    # (this pytest process runs the suite's 8-device CPU topology)
    import jax
    import jax.numpy as jnp

    from videowalk_tpu.models import CRW, CRWConfig
    from videowalk_tpu.parallel import (create_train_state, make_mesh,
                                        make_optimizer, make_train_step,
                                        replicate, shard_batch)

    cfg = CRWConfig(model_type="scratch_zeropad", temperature=0.05,
                    remove_layers=("layer2", "layer3", "layer4"))
    model = CRW(cfg)
    optimizer = make_optimizer(lr=1e-2, optim="sgd")  # see worker docstring
    host_rng = np.random.RandomState(0)
    global_batch = host_rng.randn(4, 3, 4, 32, 32, 3).astype(np.float32)
    state = create_train_state(model, optimizer,
                               jnp.asarray(global_batch[:1]),
                               jax.random.PRNGKey(0))
    mesh = make_mesh(4)
    state = replicate(state, mesh)
    step = make_train_step(model, optimizer, donate=False)
    losses = []
    for i in range(3):
        state, metrics = step(state, shard_batch(global_batch, mesh),
                              jax.random.PRNGKey(42 + i))
        losses.append(float(metrics["loss"]))

    # gloo's cross-process allreduce may order the 4-shard sums differently
    # than the single-process reduction tree -> float32-accumulation-level
    # tolerance, not bitwise
    np.testing.assert_allclose(np.asarray(losses), r0["losses"],
                               rtol=1e-4, atol=1e-6)
    leaf = np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(state.params)[0]))
    np.testing.assert_allclose(leaf, r0["leaf"], rtol=1e-3, atol=1e-6)


def test_loader_shard_disjoint_and_even():
    from videowalk_tpu.data import DataLoader

    class Dataset:
        def __len__(self):
            return 11

        def __getitem__(self, i):
            return np.asarray([i])

    batches = {}
    for rank in (0, 1):
        dl = DataLoader(Dataset(), batch_size=2, num_workers=1,
                        shard=(rank, 2))
        batches[rank] = [b for b in dl]
        assert len(dl) == len(batches[rank]) == 2  # floor(11/2)=5 -> 2 full
    seen0 = {int(v) for b in batches[0] for v in b.ravel()}
    seen1 = {int(v) for b in batches[1] for v in b.ravel()}
    assert not (seen0 & seen1), (seen0, seen1)

    with pytest.raises(ValueError):
        DataLoader(Dataset(), batch_size=2, shard=(2, 2))


@pytest.mark.slow
def test_distributed_cli_end_to_end(tmp_path):
    """Two `python train.py --distributed` processes over a synthetic
    Kinetics tree: sharded sampler, global batch 2 over 2 single-device
    processes, checkpoint written by rank 0 only."""
    import cv2

    d = tmp_path / "kinetics_synth" / "train_256"
    for cls in ("a", "b"):
        (d / cls).mkdir(parents=True)
        for vi in range(2):
            w = cv2.VideoWriter(str(d / cls / f"v{vi}.mp4"),
                                cv2.VideoWriter_fourcc(*"mp4v"), 30.0,
                                (64, 64))
            rng = np.random.RandomState(vi)
            base = rng.randint(0, 255, (64, 64, 3), np.uint8)
            for t in range(60):
                w.write(np.roll(base, t * 3, axis=1))
            w.release()

    port = _free_port()
    out_dir = tmp_path / "ckpt"

    def cmd(rank):
        return [
            sys.executable, os.path.join(REPO, "train.py"),
            "--distributed",
            "--coordinator-address", f"localhost:{port}",
            "--num-processes", "2", "--process-id", str(rank),
            "--data-path", str(tmp_path / "kinetics_synth"),
            "--batch-size", "2", "--workers", "2",
            "--frame-aug", "grid", "--clip-len", "4",
            "--temp", "0.05", "--model-type", "scratch_zeropad",
            "--img-size", "64", "--patch-size", "16", "16", "3",
            "--lr", "0.0003", "--epochs", "1", "--steps-per-epoch", "2",
            "--prob", "1.0",
            "--cache-path", str(tmp_path / f"cache{rank}.pt"),
            "--output-dir", str(out_dir),
            "--logs-dir", str(tmp_path / "logs"),
            "--frame-skip", "8", "--print-freq", "1",
        ]

    outs = _run_pair(cmd, _worker_env(1), tmp_path, timeout=1800)
    for out in outs:
        assert "Training time" in out, out[-4000:]
    assert os.path.exists(out_dir / "checkpoint.pth")


@pytest.mark.slow
def test_distributed_eval_matches_single_process(tmp_path):
    """`python test.py --distributed` shards the VIDEO LIST across
    processes: two 1-device processes split a 2-video synthetic DAVIS set
    and their masks in the shared save_path must be byte-identical to the
    single-process run (videos are independent — no collectives)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _synth import make_crw_checkpoint, make_davis_tree

    davis = make_davis_tree(str(tmp_path / "DAVIS"))
    ckpt = make_crw_checkpoint(str(tmp_path / "ckpt.pth"))
    vallist = str(tmp_path / "davis_vallist.txt")
    from videowalk_tpu.eval.make_davis_vallist import make_list

    with open(vallist, "w") as f:
        f.write("\n".join(make_list(davis)) + "\n")

    def cmd_for(save_path, extra):
        return [
            sys.executable, os.path.join(REPO, "test.py"),
            "--filelist", vallist, "--resume", ckpt,
            "--save-path", save_path,
            "--model-type", "scratch", "--cropSize", "-1",
            "--radius", "6", "--videoLen", "3", "--topk", "5",
            "--temperature", "0.05",
        ] + extra

    port = _free_port()
    shared = str(tmp_path / "dist_out")
    _run_pair(
        lambda rank: cmd_for(shared, [
            "--distributed", "--coordinator-address", f"localhost:{port}",
            "--num-processes", "2", "--process-id", str(rank)]),
        _worker_env(1), tmp_path, timeout=1800)

    single = str(tmp_path / "single_out")
    env = _worker_env(1)
    r = subprocess.run(cmd_for(single, []), env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])

    masks = sorted(f for f in os.listdir(single) if f.endswith("_mask.png"))
    assert masks, os.listdir(single)
    # both videos present in the shared dir with GLOBAL indices, and every
    # mask byte-identical to the single-process run
    assert {m.split("_")[0] for m in masks} == {"0", "1"}
    for m in masks:
        with open(os.path.join(single, m), "rb") as f1, \
                open(os.path.join(shared, m), "rb") as f2:
            assert f1.read() == f2.read(), f"mask differs: {m}"
