"""End-to-end evaluation pipeline test on a synthetic DAVIS-style dataset:
VOSDataset -> encoder feats -> on-device propagation -> dump -> convert ->
J&F metrics (the reference's test.sh:21-32 flow, all in-repo)."""

import os
import types

import numpy as np
import pytest

import cv2
from PIL import Image

from videowalk_tpu.eval import palette as palette_mod

PALETTE = palette_mod.tensor.astype(np.uint8)


@pytest.fixture(scope="module")
def davis_root(tmp_path_factory):
    """Two 10-frame videos with a moving colored square (object 1)."""
    root = tmp_path_factory.mktemp("DAVIS")
    vids = ["video0", "video1"]
    for vi, vid in enumerate(vids):
        jdir = root / "JPEGImages" / "480p" / vid
        adir = root / "Annotations" / "480p" / vid
        jdir.mkdir(parents=True)
        adir.mkdir(parents=True)
        rng = np.random.RandomState(vi)
        bg = rng.randint(0, 80, (64, 64, 3), np.uint8)
        for t in range(10):
            img = bg.copy()
            x = 8 + 4 * t
            img[20:36, x:x + 16] = [200, 40, 40]
            cv2.imwrite(str(jdir / f"{t:05d}.jpg"),
                        img[:, :, ::-1],
                        [cv2.IMWRITE_JPEG_QUALITY, 95])
            ann = np.zeros((64, 64), np.uint8)
            ann[20:36, x:x + 16] = 1
            im = Image.fromarray(ann)
            im.putpalette(PALETTE.ravel())
            im.save(str(adir / f"{t:05d}.png"))
    (root / "ImageSets" / "2017").mkdir(parents=True)
    (root / "ImageSets" / "2017" / "val.txt").write_text(
        "\n".join(vids) + "\n")
    return str(root)


@pytest.fixture(scope="module")
def filelist(davis_root, tmp_path_factory):
    from videowalk_tpu.eval.make_davis_vallist import make_list

    lines = make_list(davis_root)
    p = tmp_path_factory.mktemp("lists") / "davis_vallist.txt"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def make_args(filelist, save_path):
    return types.SimpleNamespace(
        filelist=filelist, save_path=save_path, resume="",
        model_type="scratch_zeropad", head_depth=-1,
        remove_layers=["layer4"], no_l2=False,
        topk=5, videoLen=3, radius=6.0, temperature=0.05,
        cropSize=-1, imgSize=-1, long_mem=[0], texture=False, round=False,
        norm_mask=False, workers=0, batchSize=1, manualSeed=777,
        finetune=0, pca_vis=False, visdom=False,
    )


def test_vos_dataset_shapes(filelist, tmp_path):
    from videowalk_tpu.data.vos import VOSDataset
    from videowalk_tpu.eval.test_utils import infer_downscale

    args = make_args(filelist, str(tmp_path))
    args.mapScale = infer_downscale(8)
    ds = VOSDataset(args)
    assert len(ds) == 2
    imgs, imgs_orig, lbls_resize, lbls, lblset, meta = ds[0]
    # 10 frames + videoLen(3) frame-0 copies
    assert imgs.shape == (13, 64, 64, 3)
    assert imgs_orig.shape == (13, 64, 64, 3)
    assert lbls_resize.shape == (13, 8, 8, lblset.shape[0])
    assert lblset.shape[0] == 2  # background + 1 object


def test_full_eval_pipeline(filelist, davis_root, tmp_path):
    from videowalk_tpu.cli.test import main as test_main
    from videowalk_tpu.eval.convert_davis import convert_all
    from videowalk_tpu.eval.davis_metrics import evaluate_davis

    save_path = str(tmp_path / "results")
    args = make_args(filelist, save_path)
    test_main(args)

    # dumped predictions exist
    assert os.path.exists(os.path.join(save_path, "0_0_blend.jpg"))
    assert os.path.exists(os.path.join(save_path, "0_0_mask.png"))
    assert os.path.exists(os.path.join(save_path, "1_9_mask.png"))

    converted = str(tmp_path / "converted")
    convert_all(save_path, converted, davis_root, workers=2)
    p = np.array(Image.open(os.path.join(converted, "video0", "00000.png")))
    assert p.shape == (64, 64)
    assert set(np.unique(p)) <= {0, 1}
    # frame 0 prediction is the ground truth (reference test.py:156-160) —
    # up to the feature-resolution round trip (labels are downsampled to the
    # 8x8 feature grid and upsampled back, exactly like the reference)
    gt0 = np.array(Image.open(os.path.join(
        davis_root, "Annotations", "480p", "video0", "00000.png")))
    assert (p == gt0).mean() > 0.95

    metrics = evaluate_davis(converted, davis_root)
    assert 0.0 <= metrics["J&F-Mean"] <= 1.0
    # random-weight encoder on an easy moving square: better than chance
    assert metrics["J-Mean"] > 0.05


def test_norm_mask_eval_end_to_end(filelist, tmp_path):
    """--norm-mask (reference test.py:162-164: per-pixel channel min-max
    rescale before dumping; the propagation buffer is unaffected) runs the
    full driver and produces the same artifact set."""
    from videowalk_tpu.cli.test import main as test_main

    args = make_args(filelist, str(tmp_path / "nm"))
    args.norm_mask = True
    test_main(args)
    assert os.path.exists(str(tmp_path / "nm" / "0_0_mask.png"))
    assert os.path.exists(str(tmp_path / "nm" / "1_9_blend.jpg"))


def test_vos_texture_mode(filelist):
    """--texture (reference vos.py:77-101, 247-263): frame-0 labels become
    horizontal stripes, later frames get zero labels, and the label set is
    rebuilt from the Paired colormap."""
    from videowalk_tpu.data.vos import VOSDataset

    args = make_args(filelist, "/tmp/unused")
    args.mapScale = np.array([8, 8])
    args.texture = True
    imgs, imgs_orig, lbls_resize, lbls, lblset, meta = VOSDataset(args)[0]
    n_channels = lbls_resize.shape[-1]       # background + stripes
    assert lblset.shape == (n_channels + 1, 3)
    # videoLen copies of the striped frame-0 labels, zeros afterwards
    v = args.videoLen
    assert np.array_equal(lbls_resize[0], lbls_resize[v - 1])
    assert not np.any(lbls_resize[v:])
    assert np.any(lbls_resize[0][..., 1:])  # stripes actually assigned


def test_vos_resize_and_lab_branches(filelist):
    """imgSize > 0 (square resize, reference vos.py:186-202) and the uvc
    LAB path (:206-212) through the reworked per-frame decode."""
    from videowalk_tpu.data.vos import VOSDataset

    args = make_args(filelist, "/tmp/unused")
    args.mapScale = np.array([8, 8])
    args.imgSize = 32
    imgs, imgs_orig, lbls_resize, lbls, lblset, meta = VOSDataset(args)[0]
    assert imgs.shape == (13, 32, 32, 3) and imgs.dtype == np.float32
    assert lbls_resize.shape[1:3] == (4, 4)

    args.use_lab = True
    imgs_lab = VOSDataset(args)[0][0]
    assert imgs_lab.shape == (13, 32, 32, 3)
    # LAB mode replicates the L channel into all three (reference :206-212)
    assert np.array_equal(imgs_lab[..., 0], imgs_lab[..., 1])
    assert np.abs(imgs_lab).max() <= 1.0 + 1e-6
    assert not np.array_equal(imgs_lab[0], imgs[0])


def test_eval_driver_resize_and_two_long_frames(filelist, tmp_path):
    """Driver end-to-end with --cropSize > 0 (resize path) and two
    long-term memory anchors (--long-mem 0 2)."""
    from videowalk_tpu.cli.test import main as test_main

    args = make_args(filelist, str(tmp_path / "rz"))
    args.imgSize = 32
    args.long_mem = [0, 2]
    test_main(args)
    assert os.path.exists(str(tmp_path / "rz" / "0_0_mask.png"))
    assert os.path.exists(str(tmp_path / "rz" / "1_9_mask.png"))
    m = np.asarray(Image.open(str(tmp_path / "rz" / "0_5_mask.png")))
    assert m.shape[:2] == (32, 32)


def test_eval_data_parallel_matches_single_device(filelist, tmp_path):
    """--data-parallel shards the per-frame encoder forward over the
    8-device CPU mesh; dumped masks must be identical to single-device."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    from videowalk_tpu.cli.test import main as test_main

    single, mesh = str(tmp_path / "single"), str(tmp_path / "mesh")
    a = make_args(filelist, single)
    test_main(a)
    b = make_args(filelist, mesh)
    b.data_parallel = True
    test_main(b)
    for f in sorted(os.listdir(single)):
        if f.endswith("_mask.png"):
            pa = np.asarray(Image.open(os.path.join(single, f)))
            pb = np.asarray(Image.open(os.path.join(mesh, f)))
            assert np.array_equal(pa, pb), f
    assert any(f.endswith("_mask.png") for f in os.listdir(mesh))


def test_eval_sharded_propagation_matches_single_device(filelist, tmp_path):
    """--data-parallel + the sparse backend shards the propagation itself
    (query-tile bands over the mesh) — dumped masks must match the
    single-device sparse run bit for bit. imgSize 128 -> 16x16 feature
    grid -> 2 tile rows -> 2 of the 8 CPU devices are usable."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    from videowalk_tpu.cli.test import main as test_main

    single, mesh = str(tmp_path / "single"), str(tmp_path / "mesh")
    a = make_args(filelist, single)
    a.imgSize = 128
    a.prop_backend = "sparse_interpret"
    test_main(a)
    b = make_args(filelist, mesh)
    b.imgSize = 128
    b.prop_backend = "sparse_interpret"
    b.data_parallel = True
    test_main(b)
    n = 0
    for f in sorted(os.listdir(single)):
        if f.endswith("_mask.png"):
            pa = np.asarray(Image.open(os.path.join(single, f)))
            pb = np.asarray(Image.open(os.path.join(mesh, f)))
            assert np.array_equal(pa, pb), f
            n += 1
    assert n > 0


def test_eval_profile_dir_writes_trace(filelist, tmp_path, capsys):
    """--profile-dir traces one warm video (video 1 of 2 here) — the eval
    analogue of train's steps-5-9 trace (SURVEY §5 tracing plan)."""
    from videowalk_tpu.cli.test import main as test_main

    prof = str(tmp_path / "trace")
    args = make_args(filelist, str(tmp_path / "out"))
    args.profile_dir = prof
    test_main(args)
    hits = []
    for root, _, files in os.walk(prof):
        hits += [f for f in files if f.endswith((".pb", ".json.gz",
                                                 ".trace.json.gz"))]
    assert hits, f"no profiler artifacts under {prof}"
    # the WARM video (1 of 2) is the one traced, not the compile-heavy
    # video 0 (the whole point of the feature; a len() probe on the
    # generator loader once silently defeated it)
    out = capsys.readouterr().out
    assert out.index("profiler trace written") > out.index("Vid 1")
    assert "profiler trace written" not in out[:out.index("Vid 1")]


def test_davis_metrics_perfect_and_empty(davis_root, tmp_path):
    """J&F == 1 when predictions equal ground truth."""
    from videowalk_tpu.eval.davis_metrics import evaluate_sequence

    ann = os.path.join(davis_root, "Annotations", "480p", "video0")
    per_obj = evaluate_sequence(ann, ann)
    assert per_obj, "expected at least one object track"
    for scores in per_obj.values():
        assert scores["J"] == 1.0 and scores["F"] == 1.0


def test_make_lbl_set_matches_row_unique():
    """The packed-uint32 unique must reproduce row-wise np.unique exactly
    (set AND order — lblset order defines the label channel order)."""
    from videowalk_tpu.data.vos import make_lbl_set

    rng = np.random.RandomState(0)
    lbls = rng.randint(0, 255, (4, 37, 53, 3)).astype(np.uint8)
    lbls[0, :10] = [128, 0, 0]   # repeated colors
    lbls[0, 10:20] = [0, 128, 0]
    got = make_lbl_set(lbls)
    want = np.unique(lbls[0].reshape(-1, 3).astype(np.uint8), axis=0)
    assert np.array_equal(got, want)
    assert got.dtype == np.uint8

    # non-3-channel input falls back to row-wise unique
    l1 = rng.randint(0, 4, (2, 8, 8, 1)).astype(np.uint8)
    assert np.array_equal(make_lbl_set(l1),
                          np.unique(l1[0].reshape(-1, 1), axis=0))


def test_vos_getitem_decodes_each_unique_file_once(filelist, monkeypatch):
    """The videoLen prefix repeats frame 0; its files must be decoded once."""
    from videowalk_tpu.data import vos

    calls = []
    real_imread = cv2.imread

    def counting_imread(path, *a, **k):
        calls.append(path)
        return real_imread(path, *a, **k)

    monkeypatch.setattr(vos.cv2, "imread", counting_imread)
    args = make_args(filelist, "/tmp/unused")
    args.mapScale = np.array([8, 8])
    ds = vos.VOSDataset(args)
    imgs, imgs_orig, lbls_resize, lbls, lblset, meta = ds[0]
    n_frames = 10
    assert len(calls) == len(set(calls)) == 2 * n_frames
    # prefix copies share identical content with frame videoLen
    assert np.array_equal(imgs[0], imgs[args.videoLen])
    assert imgs.shape[0] == n_frames + args.videoLen


def test_davis_metrics_refuses_empty_evaluation(davis_root, tmp_path):
    """Zero evaluated object tracks must raise, not report a perfect 1.0."""
    from videowalk_tpu.eval.davis_metrics import evaluate_davis

    empty = tmp_path / "empty_davis"
    adir = empty / "Annotations" / "480p" / "video0"
    adir.mkdir(parents=True)
    for t in range(3):  # blank annotations: no object ids in frame 0
        blank = Image.fromarray(np.zeros((16, 16), np.uint8))
        blank.putpalette(PALETTE.ravel())
        blank.save(str(adir / f"{t:05d}.png"))
    (empty / "ImageSets" / "2017").mkdir(parents=True)
    (empty / "ImageSets" / "2017" / "val.txt").write_text("video0\n")
    with pytest.raises(ValueError, match="no object tracks"):
        evaluate_davis(str(tmp_path / "nores"), str(empty))


def test_color2id_map_matches_reference_loop():
    """Packed-palette binary search == the reference's unique-color np.all
    loop (code/eval/convert_davis.py:36-66), incl. off-palette colors -> 0."""
    from videowalk_tpu.eval.convert_davis import PALETTE, color2id_map

    def ref_map(lblimg):
        flat = lblimg.reshape(-1, 3)
        out = np.zeros(flat.shape[0], np.uint8)
        for c in np.unique(flat, axis=0):
            match = np.all(PALETTE == c, axis=-1)
            if match.any():
                out[np.all(flat == c, axis=-1)] = int(np.argmax(match))
        return out.reshape(lblimg.shape[:2])

    rng = np.random.RandomState(0)
    img = PALETTE[rng.randint(0, 6, (37, 53))].copy()
    img[5:9, 5:9] = [1, 2, 3]                        # off-palette -> 0
    assert np.array_equal(color2id_map(img), ref_map(img))
    img2 = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
    assert np.array_equal(color2id_map(img2), ref_map(img2))


def test_onehot_from_lblset_matches_reference_loop():
    """Packed-uint32 one-hot build == the reference's np.all color-compare
    loop (code/data/vos.py:241-244), for 3-channel and single-channel sets."""
    from videowalk_tpu.data.vos import onehot_from_lblset

    rng = np.random.RandomState(0)
    lblset = np.array([[0, 0, 0], [128, 0, 0], [0, 128, 0]], np.uint8)
    lbl = lblset[rng.randint(0, 3, (17, 23))]
    lbl[0, 0] = [7, 8, 9]  # a color outside the set -> all-zero row
    want = np.stack([np.all(lbl == ll, axis=-1) for ll in lblset], axis=-1)
    got = onehot_from_lblset(lbl, lblset)
    assert got.dtype == np.bool_ and np.array_equal(got, want)
    assert not got[0, 0].any()

    lblset1 = np.arange(4, dtype=np.uint8).reshape(-1, 1)
    lbl1 = np.repeat(rng.randint(0, 4, (9, 11, 1)), 3, axis=-1).astype(
        np.uint8)
    want1 = np.stack([np.all(lbl1 == ll, axis=-1) for ll in lblset1], axis=-1)
    assert np.array_equal(onehot_from_lblset(lbl1, lblset1), want1)


def test_vos_threaded_decode_matches_serial(filelist):
    """--workers > 1 decodes unique frames on a thread pool; every output
    must be byte-identical to the serial path."""
    from videowalk_tpu.data import vos

    args = make_args(filelist, "/tmp/unused")
    args.mapScale = np.array([8, 8])
    serial = vos.VOSDataset(args)[0]
    args.workers = 4
    threaded = vos.VOSDataset(args)[0]
    for a, b in zip(serial[:5], threaded[:5]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dump_predictions_outputs_unchanged_by_heatmap_flag(tmp_path):
    """heatmap=False (default) must write byte-identical files to
    heatmap=True — the jet blend is a return value only, never a file."""
    from videowalk_tpu.eval import test_utils

    rng = np.random.RandomState(0)
    pred = rng.rand(8, 12, 3).astype(np.float32)
    img = rng.randint(0, 255, (64, 96, 3)).astype(np.uint8)
    lbl = np.array([[0, 0, 0], [128, 0, 0], [0, 128, 0]], np.uint8)

    b1, m1, hm1 = test_utils.dump_predictions(
        pred, lbl, img, str(tmp_path / "a"))
    b2, m2, hm2 = test_utils.dump_predictions(
        pred, lbl, img, str(tmp_path / "b"), heatmap=True)
    assert hm1 is None and hm2 is not None and hm2.shape == (64, 96, 3)
    assert np.array_equal(b1, b2) and np.array_equal(m1, m2)
    assert (tmp_path / "a_blend.jpg").read_bytes() == \
           (tmp_path / "b_blend.jpg").read_bytes()
    from PIL import Image as _Im
    pa = np.asarray(_Im.open(tmp_path / "a_mask.png"))
    pb = np.asarray(_Im.open(tmp_path / "b_mask.png"))
    assert np.array_equal(pa, pb) and np.array_equal(pa, m1.astype(np.uint8))


def test_encode_dtype_bf16_eval(filelist, tmp_path):
    """--encode-dtype bfloat16 runs the trunk in bf16 but hands f32 features
    to propagation: features must be f32 and near the f32 trunk's (the TPU
    opt-in; default stays float32 = reference parity)."""
    import jax.numpy as jnp

    from videowalk_tpu.cli.test import build_model, encode_video
    from videowalk_tpu.cli.test import main as test_main

    rng = np.random.RandomState(0)
    imgs = rng.rand(4, 64, 64, 3).astype(np.float32)

    feats = {}
    for enc in ("float32", "bfloat16"):
        args = make_args(filelist, str(tmp_path / enc))
        args.encode_dtype = enc
        model, _ = build_model(args)
        import jax
        v = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 2, 2, 64, 64, 3)), train=False)
        v = {k: v[k] for k in ("params", "batch_stats")}
        feats[enc] = np.asarray(encode_video(model, v, imgs))
    assert feats["bfloat16"].dtype == np.float32
    a = feats["float32"].reshape(4, -1)
    b = feats["bfloat16"].reshape(4, -1)
    cos = (a * b).sum(1) / (np.linalg.norm(a, axis=1)
                            * np.linalg.norm(b, axis=1) + 1e-12)
    assert cos.min() > 0.99, cos

    # the full driver runs end-to-end in bf16 and dumps the artifact set
    args = make_args(filelist, str(tmp_path / "drive"))
    args.encode_dtype = "bfloat16"
    test_main(args)
    assert os.path.exists(str(tmp_path / "drive" / "0_0_mask.png"))
