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


def test_fast_hist_out_of_range_prediction():
    """A void/out-of-class pixel in the dumped mask must be filtered, not
    crash the reshape after the whole sweep ran."""
    from videowalk_tpu.eval.eval_vip import N_CL, fast_hist

    a = np.array([0, 1, 2, 3])           # GT
    b = np.array([0, 255, 2, 19])        # prediction with a void pixel
    h = fast_hist(a, b, N_CL)
    assert h.shape == (N_CL, N_CL)
    assert h.sum() == 3                  # the 255 pair dropped
    assert h[0, 0] == 1 and h[2, 2] == 1 and h[3, 19] == 1


def test_show_result_empty_hist_raises():
    """A misconfigured -p/-g pair yields an empty histogram; that must be
    a loud error, not 'overall accuracy nan' with exit 0."""
    from videowalk_tpu.eval.eval_vip import N_CL, show_result

    with pytest.raises(RuntimeError, match="empty confusion histogram"):
        show_result(np.zeros((N_CL, N_CL)))


def test_dump_predictions_extension_only_replace(tmp_path):
    """The VIP path HACK must swap only the .jpg extension — a directory
    component containing 'jpg' used to be rewritten too, sending masks
    into a nonexistent tree."""
    from videowalk_tpu.eval.test_utils import dump_predictions

    d = tmp_path / "jpg_frames" / "videos1"
    d.mkdir(parents=True)
    pred = np.zeros((4, 4, 2), np.float32)
    pred[..., 1] = 1.0
    lbl_set = np.array([[0, 0, 0], [255, 0, 0]], np.uint8)
    img = np.zeros((16, 16, 3), np.uint8)
    prefix = str(d / "000123.jpg")
    dump_predictions(pred, lbl_set, img, prefix)
    assert os.path.exists(str(d / "000123.png"))
