"""Real multi-combo eval sweep on synthetic DAVIS (the round-4 artifact).

Mirrors the reference's sweep flow (``code/eval/run_test.py:56-78``: grid
over checkpoints x K x R -> test.py -> convert -> metrics) end-to-end on
actual hardware, without real DAVIS on disk: builds rolling low-frequency
texture videos whose ground-truth masks ride the roll (the round-3
rehearsal's discriminative setup — see STATUS round-3 item 10), trains one
checkpoint briefly on matching rolling textures, and drives
``videowalk_tpu.eval.run_test`` over 2 ckpts x 2 K x 2 R.

    python tools/sweep_synth_davis.py --workdir /tmp/sweep_r04 \
        [--train-steps 300] [--skip-train]

Products (under --workdir): DAVIS/ tree, davis_vallist.txt, ckpt_random.pth,
ckpt_trained.pth, sweep/sweep_summary.json (the per-combo results table;
copy to SWEEP_r{N}.json at the repo root for the round artifact).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HW = 320            # eval frame side -> 40x40 feature map at stride 8
N_VIDEOS = 3
N_FRAMES = 24
DX = 4              # texture roll per frame (pixels)


def lowfreq_texture(rng: np.random.RandomState, hw: int) -> np.ndarray:
    """A low-frequency RGB texture (matchable at feature stride 8)."""
    import cv2

    base = rng.rand(hw // 8, hw // 8, 3).astype(np.float32)
    up = cv2.resize(base, (hw, hw), interpolation=cv2.INTER_CUBIC)
    up = cv2.GaussianBlur(up, (0, 0), sigmaX=3.0)
    lo, hi = up.min(), up.max()
    return ((up - lo) / (hi - lo + 1e-6) * 255).astype(np.uint8)


def photometric_jitter(frame: np.ndarray, rng: np.random.RandomState,
                       strength: float) -> np.ndarray:
    """Per-frame, per-channel gain+bias jitter (uint8 in/out).

    The designed discriminator for the trained-vs-random rehearsal
    (STATUS round-3 item 10 left random-CNN features winning on clean
    rolling textures — they are a strong matching prior there): a random
    conv stack is roughly linear in intensity at its first layers, so
    independent per-frame photometric perturbations scramble its feature
    correspondences, while the CRW walk objective trained ON jittered
    frames must learn photometric-invariant features to close its cycles.
    """
    if strength <= 0:
        return frame
    gain = rng.uniform(1 - strength, 1 + strength, (1, 1, 3))
    bias = rng.uniform(-80 * strength, 80 * strength, (1, 1, 3))
    out = frame.astype(np.float32) * gain + bias
    return np.clip(out, 0, 255).astype(np.uint8)


def make_rolling_davis(root: str, jitter: float = 0.0) -> str:
    """DAVIS-2017 layout: textures + 2-object masks all rolling at DX.

    jitter > 0 applies independent per-frame photometric gain+bias to
    the JPEG frames (masks untouched — they still ride the roll).
    """
    import cv2
    from PIL import Image

    from videowalk_tpu.eval.palette import voc_colormap

    pal = voc_colormap().reshape(-1).tolist()
    vids = [f"roll{v}" for v in range(N_VIDEOS)]
    for vi, vid in enumerate(vids):
        jdir = os.path.join(root, "JPEGImages", "480p", vid)
        adir = os.path.join(root, "Annotations", "480p", vid)
        os.makedirs(jdir, exist_ok=True)
        os.makedirs(adir, exist_ok=True)
        rng = np.random.RandomState(100 + vi)
        tex = lowfreq_texture(rng, HW)
        ann0 = np.zeros((HW, HW), np.uint8)
        # two objects, fixed in TEXTURE coordinates (they ride the roll)
        y0, x0 = HW // 5, HW // 6
        ann0[y0:y0 + HW // 4, x0:x0 + HW // 4] = 1
        y1, x1 = 3 * HW // 5, HW // 2
        ann0[y1:y1 + HW // 5, x1:x1 + HW // 3] = 2
        for t in range(N_FRAMES):
            img = photometric_jitter(np.roll(tex, t * DX, axis=1),
                                     rng, jitter)
            ann = np.roll(ann0, t * DX, axis=1)
            cv2.imwrite(os.path.join(jdir, f"{t:05d}.jpg"), img[:, :, ::-1],
                        [cv2.IMWRITE_JPEG_QUALITY, 95])
            im = Image.fromarray(ann, mode="P")
            im.putpalette(pal)
            im.save(os.path.join(adir, f"{t:05d}.png"))
    os.makedirs(os.path.join(root, "ImageSets", "2017"), exist_ok=True)
    with open(os.path.join(root, "ImageSets", "2017", "val.txt"), "w") as f:
        f.write("\n".join(vids) + "\n")
    return root


def make_rolling_kinetics(root: str, vids: int = 6, hw: int = 256,
                          frames: int = 80, jitter: float = 0.0) -> str:
    """<root>/train_256/<cls>/*.mp4 rolling textures for brief training
    (per-frame photometric jitter when jitter > 0, matching the eval
    distribution so the walk objective must learn invariance to it)."""
    import cv2

    d = os.path.join(root, "train_256", "roll")
    os.makedirs(d, exist_ok=True)
    for vi in range(vids):
        rng = np.random.RandomState(vi)
        tex = lowfreq_texture(rng, hw)
        w = cv2.VideoWriter(os.path.join(d, f"v{vi}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (hw, hw))
        for t in range(frames):
            fr = photometric_jitter(np.roll(tex, t * 3, axis=1),
                                    rng, jitter)
            w.write(fr[:, :, ::-1])
        w.release()
    return os.path.join(root, "train_256")


def epoch_batches(train_flags: list[str]) -> int:
    """Real batches/epoch for a train-CLI flag list: build the same dataset,
    sampler, and loader the CLI builds and return len(loader). Runs in this
    process (decoded metadata lands in --cache-path, so the CLI run reuses
    it rather than re-probing the mp4s)."""
    from videowalk_tpu.cli.train import make_dataset
    from videowalk_tpu.data import DataLoader, RandomClipSampler
    from videowalk_tpu.utils.arguments import train_args

    args = train_args(train_flags)
    dataset = make_dataset(args, transform=None)
    sampler = (RandomClipSampler(dataset.video_clips, args.clips_per_video,
                                 seed=args.seed)
               if hasattr(dataset, "video_clips") else None)
    return len(DataLoader(dataset, batch_size=args.batch_size,
                          sampler=sampler, num_workers=1))


def make_random_ckpt(path: str) -> str:
    import jax
    import jax.numpy as jnp

    from videowalk_tpu.models import CRW, CRWConfig
    from videowalk_tpu.utils import save_checkpoint

    model = CRW(CRWConfig(model_type="scratch", head_depth=0))
    x = jnp.zeros((1, 2, 4, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    save_checkpoint(path, {"params": variables["params"],
                           "batch_stats": variables["batch_stats"]},
                    lr_scheduler_state={"step": 0}, epoch=0, args={})
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/sweep_synth_davis")
    ap.add_argument("--train-steps", type=int, default=300)
    ap.add_argument("--skip-train", action="store_true",
                    help="second checkpoint = a different random seed")
    ap.add_argument("--K", nargs="+", type=int, default=[5, 10])
    ap.add_argument("--R", nargs="+", type=float, default=[5.0, 12.0])
    ap.add_argument("--videoLen", type=int, default=5)
    ap.add_argument("--jitter", type=float, default=0.0,
                    help="per-frame photometric gain/bias strength for BOTH the\n train and eval frames (the trained-vs-random discriminator)")
    ap.add_argument("--in-process", dest="in_process",
                    action="store_true",
                    help="forward --in-process to run_test (one interpreter,\n programs shared across checkpoints)")
    args = ap.parse_args()

    wd = args.workdir
    os.makedirs(wd, exist_ok=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    davis = os.path.join(wd, "DAVIS")
    if not os.path.exists(os.path.join(davis, "ImageSets")):
        make_rolling_davis(davis, jitter=args.jitter)
    vallist = os.path.join(wd, "davis_vallist.txt")
    subprocess.run([sys.executable, "-m",
                    "videowalk_tpu.eval.make_davis_vallist",
                    "--davis", davis, "--out", vallist],
                   check=True, env=env, cwd=REPO)

    ck_rand = os.path.join(wd, "ckpt_random.pth")
    if not os.path.exists(ck_rand):
        make_random_ckpt(ck_rand)

    ck2 = os.path.join(wd, "ckpt_trained.pth")
    if not os.path.exists(ck2):
        if args.skip_train:
            import jax  # noqa: F401  (second seed via the same helper)

            make_random_ckpt(ck2)  # seed differences are in the tree only
        else:
            data = os.path.join(wd, "kinetics")
            if not os.path.exists(data):
                make_rolling_kinetics(data, jitter=args.jitter)
            out = os.path.join(wd, "train_out")
            train_flags = [
                "--data-path", os.path.join(data, "train_256"),
                "--cache-dataset",
                "--cache-path", os.path.join(wd, "cache.pt"),
                "--output-dir", out,
                "--img-size", "256", "--clip-len", "4",
                "--batch-size", "8", "--frame-skip", "4",
                "--clips-per-video", "40",
                "--augs-backend", "device", "--workers", "2",
                "--lr", "1e-4", "--print-freq", "25",
                "--sp-method", "none", "--patch-size", "64", "64", "3"]
            # Size --epochs from the REAL epoch length, measured with the
            # same dataset/sampler/loader modules the CLI uses — the naive
            # vids*clips_per_video/batch estimate is silently wrong when the
            # sampler caps at the available clips (the 2026-08-19 pilots:
            # a nominal 30-step epoch delivered ~5 batches, so
            # "--train-steps 1200" trained 200 steps; VERDICT r4 weak #3).
            # --strict-steps makes any residual mismatch fail loudly.
            bpe = epoch_batches(train_flags)
            epochs = max(1, -(-args.train_steps // bpe))
            print(f"epoch length {bpe} batches -> --epochs {epochs} "
                  f"({epochs * bpe} steps for --train-steps "
                  f"{args.train_steps})", flush=True)
            r = subprocess.run(
                [sys.executable, "-m", "videowalk_tpu.cli.train"]
                + train_flags
                + ["--epochs", str(epochs),
                   "--steps-per-epoch", str(bpe), "--strict-steps"],
                env=env, cwd=REPO)
            if r.returncode != 0:
                sys.exit(f"training failed rc={r.returncode}")
            shutil.copy(os.path.join(out, "checkpoint.pth"), ck2)
            with open(os.path.join(wd, "train_steps.json"), "w") as f:
                json.dump({"requested_train_steps": args.train_steps,
                           "epoch_batches": bpe, "epochs": epochs,
                           "delivered_train_steps": epochs * bpe}, f)

    sweep_out = os.path.join(wd, "sweep")
    cmd = [sys.executable, "-m", "videowalk_tpu.eval.run_test",
           "--checkpoints", ck_rand, ck2,
           "--filelist", vallist, "--davis", davis,
           "--out-dir", sweep_out,
           "--L", str(args.videoLen),
           "--K"] + [str(k) for k in args.K] + [
           "--R"] + [str(r) for r in args.R] + [
           "--cropSize", "-1", "--workers", "2"]
    if args.in_process:
        cmd.append("--in-process")
    print("+", " ".join(cmd), flush=True)
    rc = subprocess.run(cmd, env=env, cwd=REPO).returncode
    summary = os.path.join(sweep_out, "sweep_summary.json")
    if os.path.exists(summary):
        with open(summary) as f:
            print(json.dumps(json.load(f), indent=1))
    sys.exit(rc)


if __name__ == "__main__":
    main()
