"""Full-loop rehearsals for the JHMDB pose and VIP parsing evaluators.

Mirrors the DAVIS full-loop rehearsal (STATUS round-3 item 10) for the two
remaining reference eval modes (reference code/eval/eval_pck.py:130-151,
code/eval/eval_vip.py:86-153): train through the real CLI
(``python train.py`` subprocess) -> ``checkpoint.pth`` -> ``python test.py``
in pose / parsing mode -> ``python -m videowalk_tpu.eval.eval_pck`` /
``eval_vip`` as real subprocesses.

Discrimination axis: feature MATCHABILITY, not trained-vs-random ordering.
The round-3 DAVIS rehearsal measured that random-CNN features are a strong
matching prior at tiny training scale (J&F 0.589 random vs 0.518 after 300
steps), so a trained>random assertion would pin coin flips. What the metric
chain must demonstrate end-to-end is (a) the trained .pth flows through the
real CLI loop, and (b) the metric separates matchable inputs (rolling
low-frequency textures whose GT tracks ride the motion) from unmatchable
ones (per-frame iid noise with the same GT tracks) by a wide margin. Both
encoders (trained + random init) are run on the matchable data; both
numbers are reported in the assertion message.
"""

import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest
import scipy.io as sio

import cv2
from PIL import Image

pytestmark = pytest.mark.slow  # several CLI subprocesses: minutes of compile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HW = 64          # frame size -> 8x8 feature grid at stride 8
FRAMES = 10
DX = 4           # px/frame horizontal motion (1/2 feature cell)


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""   # single device, like a user run
    return env


def _run(cmd, **kw):
    r = subprocess.run(cmd, cwd=REPO, env=_env(), capture_output=True,
                       text=True, timeout=1800, **kw)
    assert r.returncode == 0, (cmd, r.stdout[-2000:], r.stderr[-3000:])
    return r


def _smooth_texture(rng, hw=HW, cells=8):
    """Low-frequency texture: distinctive at feature stride 8."""
    small = rng.randint(0, 255, (cells, cells, 3), np.uint8)
    return cv2.resize(small, (hw, hw), interpolation=cv2.INTER_CUBIC)


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    """python train.py --fast-test on a synthetic tree -> checkpoint.pth."""
    from _synth import make_kinetics_tree

    data = make_kinetics_tree(str(tmp_path_factory.mktemp("kin")))
    out = str(tmp_path_factory.mktemp("train_out"))
    _run([sys.executable, "train.py",
          "--data-path", os.path.join(data, "val_256"),
          "--cache-path", os.path.join(out, "cache.pt"), "--cache-dataset",
          "--fast-test", "--epochs", "1", "--steps-per-epoch", "2",
          "--img-size", str(HW), "--patch-size", "16", "16", "3",
          "--frame-aug", "grid", "--clip-len", "4", "--model-type", "scratch",
          "--lr", "0.0003", "--prob", "1",
          "--output-dir", os.path.join(out, "ckpt"),
          "--logs-dir", os.path.join(out, "logs"),
          "--frame-skip", "8", "--print-freq", "1"])
    ckpt = os.path.join(out, "ckpt", "checkpoint.pth")
    assert os.path.exists(ckpt)
    return ckpt


# ------------------------------------------------------------------- JHMDB


def _make_jhmdb(root, noise, vids=2):
    """Rolling-texture (or iid-noise) videos with GT joints riding the roll.

    15 joints on a 5x3 grid translating +DX px/frame in x; pos_img saved
    1-indexed like the real .mat files (reference data/jhmdb.py:231).
    """
    os.makedirs(root, exist_ok=True)
    lines = []
    xs, ys = np.linspace(8, 24, 5), np.linspace(16, 40, 3)
    gx, gy = np.meshgrid(xs, ys)
    grid = np.stack([gx.ravel(), gy.ravel()])          # (2=xy, 15)
    for vi in range(vids):
        vdir = os.path.join(root, f"vid{vi}")
        os.makedirs(vdir, exist_ok=True)
        rng = np.random.RandomState(100 + vi)
        base = _smooth_texture(rng)
        pos = np.zeros((2, 15, FRAMES))
        for t in range(FRAMES):
            img = (rng.randint(0, 255, (HW, HW, 3), np.uint8) if noise
                   else np.roll(base, t * DX, axis=1))
            cv2.imwrite(os.path.join(vdir, f"{t:05d}.png"), img)
            pos[0, :, t] = grid[0] + t * DX
            pos[1, :, t] = grid[1]
        mat = os.path.join(root, f"joint_positions_{vi}.mat")
        sio.savemat(mat, {"pos_img": pos + 1})
        lines.append(f"{vdir} {mat}")
    fl = os.path.join(root, "jhmdb_list.txt")   # 'jhmdb' => pose mode
    with open(fl, "w") as f:
        f.write("\n".join(lines) + "\n")
    return fl


def _pck(filelist, ckpt, save, resume=True):
    cmd = [sys.executable, "test.py", "--filelist", filelist,
           "--model-type", "scratch_zeropad", "--save-path", save,
           "--topk", "5", "--videoLen", "2", "--radius", "4",
           "--temperature", "0.05", "--cropSize", "-1", "--workers", "0"]
    if resume:
        cmd += ["--resume", ckpt]
    _run(cmd)
    r = _run([sys.executable, "-m", "videowalk_tpu.eval.eval_pck",
              "--filelist", filelist, "--src", save, "--feat-res", "8"])
    vals = dict(re.findall(r"^(0\.\d): (\d+\.\d+)$", r.stdout, re.M))
    assert set(vals) == {"0.1", "0.2", "0.3", "0.4", "0.5"}, r.stdout
    return {float(k): float(v) for k, v in vals.items()}


def test_jhmdb_full_loop_discriminates(trained_ckpt, tmp_path):
    track_fl = _make_jhmdb(str(tmp_path / "jhmdb_track"), noise=False)
    noise_fl = _make_jhmdb(str(tmp_path / "jhmdb_noise"), noise=True)

    trained = _pck(track_fl, trained_ckpt, str(tmp_path / "out_trained"))
    random_ = _pck(track_fl, trained_ckpt, str(tmp_path / "out_random"),
                   resume=False)
    noisy = _pck(noise_fl, trained_ckpt, str(tmp_path / "out_noise"))

    msg = (f"PCK@0.5 trained={trained[0.5]:.1f} random={random_[0.5]:.1f} "
           f"noise={noisy[0.5]:.1f}")
    # matchable >> unmatchable for the trained .pth through the full loop
    assert trained[0.5] >= noisy[0.5] + 25.0, msg
    assert trained[0.5] >= 60.0, msg     # tracks the texture
    # random-init features also match (known-strong prior); the LOOP must
    # still separate them from noise, else the metric is feature-blind
    assert random_[0.5] >= noisy[0.5] + 25.0, msg


# --------------------------------------------------------------------- VIP


def _make_vip(root, noise):
    """One VIP-style video: parsing regions (classes 4, 8) riding the roll."""
    vdir = os.path.join(root, "Images", "videos1")
    adir = os.path.join(root, "Category_ids", "videos1")
    os.makedirs(vdir, exist_ok=True)
    os.makedirs(adir, exist_ok=True)
    rng = np.random.RandomState(7)
    base = _smooth_texture(rng)
    ann0 = np.zeros((HW, HW), np.uint8)
    ann0[12:28, 4:20] = 4    # 'upper-clothes'
    ann0[36:52, 4:20] = 8    # 'pants'
    for t in range(FRAMES):
        img = (rng.randint(0, 255, (HW, HW, 3), np.uint8) if noise
               else np.roll(base, t * DX, axis=1))
        cv2.imwrite(os.path.join(vdir, f"{t:06d}.png"), img[:, :, ::-1])
        ann = np.roll(ann0, t * DX, axis=1)
        Image.fromarray(ann).save(os.path.join(adir, f"{t:06d}.png"))
    fl = os.path.join(root, "vip_list.txt")
    with open(fl, "w") as f:
        f.write(f"{vdir} {adir}\n")
    return fl, os.path.join(root, "Category_ids")


def _miou(filelist, gt_root, ckpt, save):
    _run([sys.executable, "test.py", "--filelist", filelist,
          "--model-type", "scratch_zeropad", "--resume", ckpt,
          "--save-path", save, "--topk", "5", "--videoLen", "2",
          "--radius", "4", "--temperature", "0.05", "--cropSize", "-1",
          "--workers", "0"])
    r = _run([sys.executable, "-m", "videowalk_tpu.eval.eval_vip",
              "-p", save, "-g", gt_root])
    m = re.search(r">>> mean IU (\d+\.\d+)", r.stdout)
    assert m, r.stdout[-2000:]
    return float(m.group(1))


def test_vip_full_loop_discriminates(trained_ckpt, tmp_path):
    track_fl, track_gt = _make_vip(str(tmp_path / "VIP_track"), noise=False)
    noise_fl, noise_gt = _make_vip(str(tmp_path / "VIP_noise"), noise=True)

    miou_track = _miou(track_fl, track_gt, trained_ckpt,
                       str(tmp_path / "res_track"))
    miou_noise = _miou(noise_fl, noise_gt, trained_ckpt,
                       str(tmp_path / "res_noise"))
    msg = f"mIoU track={miou_track:.3f} noise={miou_noise:.3f}"
    assert miou_track >= miou_noise + 0.15, msg
    assert miou_track >= 0.5, msg
