"""Train-driver CLI tests: full main() on synthetic videos, including the
--data-parallel 8-device mesh path and checkpoint emission."""

import os

import numpy as np
import pytest

import cv2


@pytest.fixture(scope="module")
def kinetics_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("kin") / "kinetics_synth"
    d = root / "val_256"
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
    return str(root)


def make_args(kinetics_dir, tmp_path, **over):
    from videowalk_tpu.utils.arguments import train_args

    argv = [
        "--data-path", kinetics_dir, "--fast-test",
        "--frame-aug", "grid", "--clip-len", "4",
        "--temp", "0.05", "--model-type", "scratch_zeropad",
        "--img-size", "64", "--patch-size", "16", "16", "3",
        "--lr", "0.0003", "--epochs", "1", "--steps-per-epoch", "2",
        "--prob", "1.0",
        "--cache-path", os.path.join(str(tmp_path), "cache.pt"),
        "--output-dir", os.path.join(str(tmp_path), "ckpt"),
        "--logs-dir", os.path.join(str(tmp_path), "logs"),
        "--frame-skip", "8", "--print-freq", "1",
    ]
    for k, v in over.items():
        argv.extend([k] + ([] if v is None else list(v)))
    return train_args(argv)


def test_train_main_patch_path(kinetics_dir, tmp_path):
    from videowalk_tpu.cli.train import main

    args = make_args(kinetics_dir, tmp_path)
    state = main(args)
    assert int(state.step) == 2
    assert os.path.exists(os.path.join(str(tmp_path), "ckpt",
                                       "checkpoint.pth"))
    assert os.path.exists(os.path.join(str(tmp_path), "ckpt",
                                       "model_0.pth"))


def test_train_main_data_parallel_mesh(kinetics_dir, tmp_path):
    """--data-parallel shards batch 8 over the 8 virtual CPU devices."""
    import jax

    from videowalk_tpu.cli.train import main

    assert len(jax.devices()) == 8
    args = make_args(kinetics_dir, tmp_path)
    # undo fast-test shrink: mesh needs batch divisible by devices
    args.batch_size = 8
    args.data_parallel = True
    args.workers = 2
    state = main(args)
    assert int(np.asarray(state.step)) == 2


def test_train_main_superpixel_host_backend(kinetics_dir, tmp_path):
    from videowalk_tpu.cli.train import main

    args = make_args(kinetics_dir, tmp_path,
                     **{"--prob": ["0.0"], "--sp-method": ["slic"],
                        "--num-sp": ["8"], "--max-sp-num": ["12"],
                        "--compactness": ["50"],
                        "--sp-backend": ["host"]})
    state = main(args)
    assert int(state.step) == 2


@pytest.fixture(scope="module")
def image_folder_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs") / "image_synth"
    for cls in ("a", "b"):
        (root / cls).mkdir(parents=True)
        rng = np.random.RandomState(hash(cls) % 1000)
        for i in range(3):
            img = rng.randint(0, 255, (72, 72, 3), np.uint8)
            cv2.imwrite(str(root / cls / f"img{i}.jpg"), img)
    return str(root)


def test_train_main_image_folder(image_folder_dir, tmp_path):
    """Image-dataset training (the reference's ImageFolder HACK branch,
    code/train.py:179-180 — functional here via static clips of
    independently augmented views; see data/image_folder.py)."""
    from videowalk_tpu.cli.train import main
    from videowalk_tpu.data.image_folder import ImageFolder, is_image_folder

    assert is_image_folder(image_folder_dir)
    ds = ImageFolder(image_folder_dir, clip_len=4)
    assert len(ds) == 6
    views, sp_mask, label = ds[0]
    assert views["grid"].shape[0] == 4 and label in (0, 1)

    args = make_args(image_folder_dir, tmp_path)
    state = main(args)
    assert int(state.step) == 2
