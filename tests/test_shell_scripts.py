"""The SHIPPED shell scripts, driven end-to-end as real subprocesses.

Every other e2e test calls main(args) in-process; these run ``bash train.sh``
and ``bash test.sh`` exactly as a user would (reference recipes:
code/train.sh, code/test.sh:21-32), on synthetic Kinetics/DAVIS trees, and
assert a checkpoint and a J&F number come out (VERDICT r2 item 3).
"""

import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # two full CLI subprocesses: minutes of compile

from _synth import make_davis_tree, make_kinetics_tree

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    # don't inherit the conftest's 8-device virtual mesh: the recipes run as
    # a user would (train.sh's --data-parallel no-ops on a single device;
    # --fast-test's batch 1 is not divisible by 8)
    env["XLA_FLAGS"] = ""
    return env


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """bash train.sh on a synthetic Kinetics tree -> checkpoint.pth."""
    data = make_kinetics_tree(str(tmp_path_factory.mktemp("kin")))
    out = str(tmp_path_factory.mktemp("train_out"))
    env = _env()
    env["DATA_PATH"] = data
    env["CACHE_PATH"] = os.path.join(out, "cache.pt")
    r = subprocess.run(
        ["bash", "train.sh",
         # small-shape overrides ride through train.sh's "$@"
         "--fast-test", "--epochs", "1", "--steps-per-epoch", "2",
         "--img-size", "64", "--patch-size", "16", "16", "3",
         "--dilation-kernel-size", "9", "--num-sp", "8", "--max-sp-num", "12",
         "--output-dir", os.path.join(out, "ckpt"),
         "--logs-dir", os.path.join(out, "logs"),
         "--frame-skip", "8", "--print-freq", "1"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    ckpt = os.path.join(out, "ckpt", "checkpoint.pth")
    assert os.path.exists(ckpt), os.listdir(os.path.join(out, "ckpt"))
    return ckpt, r.stdout


def test_train_sh_end_to_end(trained):
    ckpt, stdout = trained
    assert "Start training" in stdout
    # the recipe's probabilistic patch/superpixel mixing ran
    assert "Epoch: [0]" in stdout


def test_test_sh_end_to_end(trained, tmp_path):
    """bash test.sh: vallist -> test.py -> convert_davis -> davis_metrics,
    asserting a J&F number is produced (reference code/test.sh:21-32)."""
    ckpt, _ = trained
    davis = make_davis_tree(str(tmp_path / "DAVIS"))
    out = str(tmp_path / "results")
    env = _env()
    env.update(DAVIS=davis, CKPT=ckpt, OUT=out,
               VALLIST=str(tmp_path / "davis_vallist.txt"))
    r = subprocess.run(
        ["bash", "test.sh", "--radius", "6", "--videoLen", "3",
         "--topk", "5"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    m = re.search(r"'J&F-Mean': ([0-9.]+)", r.stdout)
    assert m, r.stdout[-2000:]
    jf = float(m.group(1))
    assert 0.0 <= jf <= 1.0
    # converted palette PNGs exist at the official layout
    assert os.path.exists(os.path.join(out + "_converted", "video0",
                                       "00000.png"))
