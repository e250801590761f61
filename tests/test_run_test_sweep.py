"""Sweep orchestrator unit tests (videowalk_tpu/eval/run_test.py)."""

import os
import time

import pytest

from videowalk_tpu.eval.run_test import newest_model, run_one


def test_newest_model_picks_latest(tmp_path):
    d = tmp_path / "ckpts"
    d.mkdir()
    for i, name in enumerate(["model_0.pth", "model_3.pth", "model_1.pth"]):
        p = d / name
        p.write_bytes(b"x")
        os.utime(p, (time.time() - 100 + i * 10,) * 2)
    assert newest_model(str(d)).endswith("model_1.pth")  # newest mtime
    # direct file paths pass through
    f = tmp_path / "model_9.pth"
    f.write_bytes(b"x")
    assert newest_model(str(f)) == str(f)


def test_newest_model_empty_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        newest_model(str(tmp_path))


def test_run_one_sbatch_emits_script(tmp_path, monkeypatch):
    """--sbatch mode writes a job script with the full 3-command chain
    (reference run_test.py:69-73 SLURM path) without executing anything."""
    import types

    calls = []
    import subprocess

    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: calls.append(a) or
                        types.SimpleNamespace(returncode=0))
    ckpt = tmp_path / "model_5.pth"
    ckpt.write_bytes(b"x")
    args = types.SimpleNamespace(
        out_dir=str(tmp_path / "sweep"), filelist="fl.txt",
        model_type="scratch", davis="/data/DAVIS", cropSize=-1, sbatch=True)
    res = run_one(str(ckpt), 20, 10, 0.05, 12.0, args)
    assert res["submitted"]
    script = os.path.join(args.out_dir, "model_5_L20_K10_T0.05_R12.0",
                          "job.sh")
    body = open(script).read()
    assert "test.py" in body and "convert_davis" in body \
        and "davis_metrics" in body
    assert calls and calls[0][0][0] == "sbatch"
