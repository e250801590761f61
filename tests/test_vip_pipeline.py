"""VIP parsing pipeline on synthetic data: VOSDataset with a 'VIP' filelist
-> test driver (per-frame nested output paths) -> eval_vip metrics
(reference test.py:178-181 + code/eval/eval_vip.py)."""

import os
import types

import numpy as np
import pytest

import cv2
from PIL import Image


@pytest.fixture(scope="module")
def vip_root(tmp_path_factory):
    """One VIP-style video: frames + 20-class indexed annotations."""
    root = tmp_path_factory.mktemp("VIP")
    vdir = root / "Images" / "videos1"
    adir = root / "Category_ids" / "videos1"
    vdir.mkdir(parents=True)
    adir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    bg = rng.randint(0, 100, (64, 64, 3), np.uint8)
    for t in range(6):
        img = bg.copy()
        x = 8 + 6 * t
        img[20:40, x:x + 16] = [180, 60, 60]
        cv2.imwrite(str(vdir / f"{t:06d}.png"), img[:, :, ::-1])
        ann = np.zeros((64, 64), np.uint8)
        ann[20:40, x:x + 16] = 4  # 'upper-clothes'
        Image.fromarray(ann).save(str(adir / f"{t:06d}.png"))
    fl = root / "vip_list.txt"
    fl.write_text(f"{vdir} {adir}\n")
    return str(root), str(fl)


def test_vip_pipeline_and_metrics(vip_root, tmp_path):
    from videowalk_tpu.cli.test import main as test_main
    from videowalk_tpu.eval.eval_vip import compute_hist, show_result

    root, fl = vip_root
    save_path = str(tmp_path / "results")
    args = types.SimpleNamespace(
        filelist=fl, save_path=save_path, resume="",
        model_type="scratch_zeropad", head_depth=-1,
        remove_layers=["layer4"], no_l2=False,
        topk=5, videoLen=2, radius=4.0, temperature=0.05,
        cropSize=-1, imgSize=-1, long_mem=[0], texture=False, round=False,
        norm_mask=False, workers=0, batchSize=1, manualSeed=777,
        finetune=0, pca_vis=False, visdom=False,
    )
    test_main(args)

    # VIP writes into per-video subdirs mirroring the dataset layout
    # (reference test.py:178-181); the reference's path hack
    # (test_utils.py:112-118) names the id masks {frame}.png directly.
    out_vdir = os.path.join(save_path, "videos1")
    assert os.path.isdir(out_vdir)
    masks = [f for f in os.listdir(out_vdir)
             if f.endswith(".png") and "blend" not in f]
    assert len(masks) == 6

    hist = compute_hist(save_path, os.path.join(root, "Category_ids"))
    res = show_result(hist)
    assert 0.0 <= res["mIoU"] <= 1.0
    assert res["overall_acc"] > 0.3  # background dominates; random feats ok
