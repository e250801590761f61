"""Hyperparameter sweep orchestrator for evaluation.

Parity surface with reference ``code/eval/run_test.py``: grid product over
(checkpoints x videoLen L x topk K x temperature T x radius R) -> runs
test.py -> convert_davis -> DAVIS J&F for each combo; auto-picks the newest
``model_*.pth`` when given a checkpoint directory (:10-11); optional batch
scheduler submission (--sbatch emits one script per combo like the
reference's SLURM path, :69-73).

CLI: python -m videowalk_tpu.eval.run_test --checkpoints c1 [c2 ...] \
        --filelist davis_vallist.txt --davis /path/DAVIS [--L 20] [--K 10] ...
"""

from __future__ import annotations

import argparse
import itertools
import os
import subprocess
import sys


def newest_model(path: str) -> str:
    """Newest model_*.pth inside a checkpoint dir (reference :10-11)."""
    if os.path.isdir(path):
        cands = [f for f in os.listdir(path)
                 if f.startswith("model_") and f.endswith(".pth")]
        cands.sort(key=lambda f: os.path.getmtime(os.path.join(path, f)))
        if not cands:
            raise FileNotFoundError(f"no model_*.pth in {path}")
        return os.path.join(path, cands[-1])
    return path


def run_one(ckpt: str, L: int, K: int, T: float, R: float, args) -> dict:
    name = (os.path.basename(ckpt).replace(".pth", "")
            + f"_L{L}_K{K}_T{T}_R{R}")
    save_path = os.path.join(args.out_dir, name)
    masks_path = os.path.join(save_path, "converted")
    os.makedirs(save_path, exist_ok=True)

    cmds = [
        # module invocation (not a cwd-relative "test.py"): works from any
        # working directory as long as the package is importable
        [sys.executable, "-m", "videowalk_tpu.cli.test",
         "--filelist", args.filelist,
         "--model-type", args.model_type,
         "--resume", ckpt,
         "--save-path", save_path,
         "--topk", str(K), "--videoLen", str(L),
         "--radius", str(R), "--temperature", str(T),
         "--cropSize", str(args.cropSize),
         "--workers", str(getattr(args, "workers", 4)),
         "--prop-backend", getattr(args, "prop_backend", "auto")]
        + (["--data-parallel"] if getattr(args, "data_parallel", False)
           else []),
        [sys.executable, "-m", "videowalk_tpu.eval.convert_davis",
         "-i", save_path, "-o", masks_path, "-d", args.davis],
        [sys.executable, "-m", "videowalk_tpu.eval.davis_metrics",
         "--results", masks_path, "--davis", args.davis],
    ]
    if args.sbatch:
        script = os.path.join(save_path, "job.sh")
        with open(script, "w") as f:
            f.write("#!/bin/bash\n")
            for c in cmds:
                f.write(" ".join(c) + "\n")
        subprocess.run(["sbatch", script], check=False)
        return {"name": name, "submitted": True}

    for c in cmds:
        print("+", " ".join(c), flush=True)
        subprocess.run(c, check=True)
    return {"name": name, "done": True}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoints", nargs="+", required=True,
                        help="checkpoint files or dirs (newest model_* used)")
    parser.add_argument("--filelist", required=True)
    parser.add_argument("--davis", required=True, help="DAVIS dataset root")
    parser.add_argument("--model-type", default="scratch")
    parser.add_argument("--out-dir", default="./sweep_results")
    parser.add_argument("--cropSize", default=-1, type=int)
    parser.add_argument("--L", nargs="+", type=int, default=[20])
    parser.add_argument("--K", nargs="+", type=int, default=[10])
    parser.add_argument("--T", nargs="+", type=float, default=[0.05])
    parser.add_argument("--R", nargs="+", type=float, default=[12.0])
    parser.add_argument("--sbatch", action="store_true")
    # forwarded to every test.py invocation (TPU extensions; defaults match
    # the CLI's own defaults)
    parser.add_argument("--workers", default=4, type=int,
                        help="threaded frame decode inside each video")
    parser.add_argument("--prop-backend", default="auto",
                        choices=["auto", "xla", "tiled", "windowed",
                                 "sparse", "sparse_interpret"])
    parser.add_argument("--data-parallel", dest="data_parallel",
                        action="store_true",
                        help="shard encode + sparse propagation over all "
                             "local devices in each test.py run")
    args = parser.parse_args(argv)

    ckpts = [newest_model(c) for c in args.checkpoints]
    for ckpt, L, K, T, R in itertools.product(ckpts, args.L, args.K,
                                              args.T, args.R):
        run_one(ckpt, L, K, T, R, args)


if __name__ == "__main__":
    main()
