"""JHMDB pose propagation pipeline on synthetic data: JhmdbSet -> test
driver -> .dat keypoints -> PCK metric (reference test.sh pose flow)."""

import os
import types

import numpy as np
import pytest
import scipy.io as sio

import cv2


@pytest.fixture(scope="module")
def jhmdb_root(tmp_path_factory):
    """Two tiny videos with 15-joint GT tracks."""
    root = tmp_path_factory.mktemp("jhmdb")
    lines = []
    for vi in range(2):
        vdir = root / f"vid{vi}"
        vdir.mkdir()
        rng = np.random.RandomState(vi)
        n_frames = 8
        for t in range(n_frames):
            img = rng.randint(0, 255, (64, 64, 3), np.uint8)
            cv2.imwrite(str(vdir / f"{t:05d}.png"), img)
        # pos_img: (2, 15 joints, T), 1-indexed like the .mat files
        base = rng.rand(2, 15, 1) * 40 + 10
        drift = np.arange(n_frames)[None, None, :] * 0.5
        pos = base + drift
        mat = str(root / f"joint_positions_{vi}.mat")
        sio.savemat(mat, {"pos_img": pos + 1})
        lines.append(f"{vdir} {mat}")
    fl = root / "jhmdb_list.txt"
    fl.write_text("\n".join(lines) + "\n")
    return str(root), str(fl)


def test_jhmdb_dataset_shapes(jhmdb_root):
    from videowalk_tpu.data.jhmdb import JhmdbSet
    from videowalk_tpu.eval.test_utils import infer_downscale

    root, fl = jhmdb_root
    args = types.SimpleNamespace(
        filelist=fl, imgSize=-1, videoLen=2,
        mapScale=infer_downscale(8), texture=False, round=False)
    ds = JhmdbSet(args)
    imgs, imgs_orig, lbls, _, lblset, meta = ds[0]
    assert imgs.shape == (10, 64, 64, 3)         # 8 frames + 2 ctx copies
    assert lbls.shape == (10, 8, 8, 16)          # bg + 15 joints at 8x8
    assert lblset.shape == (16, 3)


def test_jhmdb_threaded_decode_matches_serial(jhmdb_root):
    """--workers > 1 decodes unique frames on a thread pool (same contract
    as VOSDataset); outputs must be byte-identical to the serial path."""
    from videowalk_tpu.data.jhmdb import JhmdbSet
    from videowalk_tpu.eval.test_utils import infer_downscale

    root, fl = jhmdb_root
    kw = dict(filelist=fl, imgSize=-1, videoLen=2,
              mapScale=infer_downscale(8), texture=False, round=False)
    serial = JhmdbSet(types.SimpleNamespace(**kw))[0]
    threaded = JhmdbSet(types.SimpleNamespace(**kw, workers=4))[0]
    for a, b in zip(serial[:5], threaded[:5]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_jhmdb_full_pipeline_and_pck(jhmdb_root, tmp_path):
    from videowalk_tpu.cli.test import main as test_main
    from videowalk_tpu.eval.eval_pck import compute_pck

    root, fl = jhmdb_root
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

    # keypoint .dat files dumped per video (reference test.py:197-199)
    assert os.path.exists(os.path.join(save_path, "0.dat"))
    assert os.path.exists(os.path.join(save_path, "1.dat"))
    pred = np.load(os.path.join(save_path, "0.dat"), allow_pickle=True)
    assert pred.shape[0] == 2 and pred.shape[1] == 15

    # PCK computes (random features -> low numbers, but well-formed)
    results = compute_pck(fl, save_path)
    assert set(results) == {0.1, 0.2, 0.3, 0.4, 0.5}
    for v in results.values():
        assert 0.0 <= v <= 100.0
    # PCK is monotone in the threshold
    vals = [results[t] for t in (0.1, 0.2, 0.3, 0.4, 0.5)]
    assert vals == sorted(vals)


def test_jhmdb_driver_resize_and_pca_vis(jhmdb_root, tmp_path):
    """Driver end-to-end on JHMDB with --cropSize > 0 (the resize branch of
    the reworked decode) and --pca-vis (PCA feature PNGs)."""
    from videowalk_tpu.cli.test import main as test_main
    from videowalk_tpu.eval.test_utils import infer_downscale

    root, fl = jhmdb_root
    save = str(tmp_path / "out")
    args = types.SimpleNamespace(
        filelist=fl, save_path=save, resume="",
        model_type="scratch_zeropad", head_depth=-1,
        remove_layers=["layer4"], no_l2=False,
        topk=3, videoLen=2, radius=4.0, temperature=0.05,
        cropSize=32, imgSize=32, long_mem=[0], texture=False, round=False,
        norm_mask=False, workers=2, batchSize=1, manualSeed=777,
        finetune=0, pca_vis=True, visdom=False,
        mapScale=infer_downscale(8))
    test_main(args)
    assert os.path.exists(os.path.join(save, "0.dat"))       # keypoints
    assert os.path.exists(os.path.join(save, "pca", "0_0.png"))
    assert os.path.exists(os.path.join(save, "0_0_blend.jpg"))
    # keypoint dump decodes and has the reference layout (2, n_joints, T)
    kp = np.load(os.path.join(save, "0.dat"), allow_pickle=True)
    assert kp.ndim == 3 and kp.shape[0] == 2 and kp.shape[1] == 15


def test_uniform_clip_sampler():
    from videowalk_tpu.data.clips import UniformClipSampler, VideoClipIndex

    index = VideoClipIndex.__new__(VideoClipIndex)
    index.cumulative = [0, 10, 10, 25]  # video 1 empty
    s = UniformClipSampler(index, 3)
    idxs = list(iter(s))
    assert len(idxs) == len(s) == 6
    assert idxs[:3] == [0, 4, 9] or idxs[:3] == [0, 5, 9]
    assert all(10 <= i <= 24 for i in idxs[3:])
