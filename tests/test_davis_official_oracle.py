"""Differential test: eval/davis_metrics.py vs the OFFICIAL
davis2017-evaluation algorithm, independently re-ported here as an oracle.

The reference evaluates J&F by shelling out to the external
``davisvideochallenge/davis2017-evaluation`` package
(/root/reference/Dockerfile:19-20, code/test.sh:30-32). That package is not
in this image, so this file ports its metric functions (`db_eval_iou`,
`db_eval_boundary`/`_seg2bmap` from davis2017/metrics.py) and its
semi-supervised aggregation (davis2017/evaluation.py: drop first+last frame,
per-(sequence,object) track means, global mean over tracks; void pixels
(label 255) zeroed out of the GT in davis.py's mask reader) with different
code (scipy dilation instead of skimage/cv2, no shared helpers), then diffs
our implementation against it on random multi-object masks, empty masks,
void labels, and a full on-disk sequence.
"""

import math
import os

import numpy as np
import pytest

from videowalk_tpu.eval.davis_metrics import (evaluate_davis, f_measure,
                                              jaccard, seg2bmap)

cv2 = pytest.importorskip("cv2")
from scipy import ndimage  # noqa: E402


# ---------------------------------------------------------------- the oracle
# Faithful port of davis2017-evaluation/davis2017/metrics.py (same-resolution
# path of _seg2bmap; the resampling branch is never taken at annotation
# resolution, which is how the official tool always runs on DAVIS).


def _official_seg2bmap(seg):
    seg = seg.astype(np.bool_)
    e = np.zeros_like(seg)
    s = np.zeros_like(seg)
    se = np.zeros_like(seg)
    e[:, :-1] = seg[:, 1:]
    s[:-1, :] = seg[1:, :]
    se[:-1, :-1] = seg[1:, 1:]
    b = seg ^ e | seg ^ s | seg ^ se
    b[-1, :] = seg[-1, :] ^ e[-1, :]
    b[:, -1] = seg[:, -1] ^ s[:, -1]
    b[-1, -1] = 0
    return b


def _official_disk(radius):
    # skimage.morphology.disk
    L = np.arange(-radius, radius + 1)
    X, Y = np.meshgrid(L, L)
    return np.array(X ** 2 + Y ** 2 <= radius ** 2, dtype=np.uint8)


def _official_db_eval_boundary(foreground_mask, gt_mask, void_pixels=None,
                               bound_th=0.008):
    bound_pix = bound_th if bound_th >= 1 else \
        np.ceil(bound_th * np.linalg.norm(foreground_mask.shape))
    if void_pixels is None:
        void_pixels = np.zeros_like(foreground_mask, dtype=np.bool_)
    fg_boundary = _official_seg2bmap(
        foreground_mask * np.logical_not(void_pixels))
    gt_boundary = _official_seg2bmap(gt_mask * np.logical_not(void_pixels))
    st = _official_disk(int(bound_pix))
    fg_dil = ndimage.binary_dilation(fg_boundary, structure=st)
    gt_dil = ndimage.binary_dilation(gt_boundary, structure=st)
    gt_match = gt_boundary * fg_dil
    fg_match = fg_boundary * gt_dil
    n_fg = np.sum(fg_boundary)
    n_gt = np.sum(gt_boundary)
    if n_fg == 0 and n_gt > 0:
        precision, recall = 1.0, 0.0
    elif n_fg > 0 and n_gt == 0:
        precision, recall = 0.0, 1.0
    elif n_fg == 0 and n_gt == 0:
        precision, recall = 1.0, 1.0
    else:
        precision = np.sum(fg_match) / float(n_fg)
        recall = np.sum(gt_match) / float(n_gt)
    if precision + recall == 0:
        return 0.0
    return 2.0 * precision * recall / (precision + recall)


def _official_db_eval_iou(annotation, segmentation, void_pixels=None):
    annotation = annotation.astype(np.bool_)
    segmentation = segmentation.astype(np.bool_)
    if void_pixels is None:
        void_pixels = np.zeros_like(segmentation, dtype=np.bool_)
    inters = np.sum((segmentation & annotation) & np.logical_not(void_pixels))
    union = np.sum((segmentation | annotation) & np.logical_not(void_pixels))
    j = inters / union if union > 0 else 0.0
    if np.isclose(union, 0):
        j = 1.0
    return j


# -------------------------------------------------------------- random masks


def _blobby_mask(seed, h=97, w=123, thresh=0.55):
    rng = np.random.RandomState(seed)
    noise = rng.rand(h, w).astype(np.float32)
    smooth = cv2.GaussianBlur(noise, (0, 0), sigmaX=6)
    smooth = (smooth - smooth.min()) / (np.ptp(smooth) + 1e-12)
    return smooth > thresh


@pytest.mark.parametrize("seed", range(8))
def test_f_measure_matches_official_on_random_masks(seed):
    pred = _blobby_mask(3 * seed)
    gt = _blobby_mask(3 * seed + 1, thresh=0.5)
    ours = f_measure(pred, gt)
    official = _official_db_eval_boundary(pred, gt)
    assert abs(ours - official) < 1e-9, (ours, official)


@pytest.mark.parametrize("seed", range(8))
def test_jaccard_matches_official_on_random_masks(seed):
    pred = _blobby_mask(5 * seed)
    gt = _blobby_mask(5 * seed + 2, thresh=0.5)
    assert abs(jaccard(pred, gt) - _official_db_eval_iou(gt, pred)) < 1e-12


def test_seg2bmap_matches_official_exactly():
    for seed in range(6):
        m = _blobby_mask(seed, h=40, w=61, thresh=0.5)
        np.testing.assert_array_equal(seg2bmap(m), _official_seg2bmap(m))
    # degenerate: full / empty / single-pixel
    np.testing.assert_array_equal(seg2bmap(np.ones((5, 7), bool)),
                                  _official_seg2bmap(np.ones((5, 7), bool)))
    np.testing.assert_array_equal(seg2bmap(np.zeros((5, 7), bool)),
                                  _official_seg2bmap(np.zeros((5, 7), bool)))
    one = np.zeros((9, 9), bool)
    one[4, 4] = True
    np.testing.assert_array_equal(seg2bmap(one), _official_seg2bmap(one))


def test_empty_mask_cases_match_official():
    gt = _blobby_mask(1)
    empty = np.zeros_like(gt)
    for a, b in [(empty, gt), (gt, empty), (empty, empty)]:
        assert abs(f_measure(a, b)
                   - _official_db_eval_boundary(a, b)) < 1e-12
        assert abs(jaccard(a, b) - _official_db_eval_iou(b, a)) < 1e-12


def _write_indexed(path, arr):
    from PIL import Image

    from videowalk_tpu.eval.palette import voc_colormap

    img = Image.fromarray(arr.astype(np.uint8), mode="P")
    img.putpalette(voc_colormap().reshape(-1).tolist())
    img.save(path)


def test_sequence_aggregation_matches_official_protocol(tmp_path):
    """Full pipeline vs an in-test port of the official aggregation:
    multi-object sequence with a void (255) region in the GT, predictions
    missing one frame, first/last frame exclusion, per-track global mean."""
    h, w, n_frames = 64, 80, 6
    davis = tmp_path / "DAVIS"
    results = tmp_path / "results"
    seq = "synth"
    ann = davis / "Annotations" / "480p" / seq
    jpg = davis / "JPEGImages" / "480p" / seq
    ann.mkdir(parents=True)
    jpg.mkdir(parents=True)
    (davis / "ImageSets" / "2017").mkdir(parents=True)
    (davis / "ImageSets" / "2017" / "val.txt").write_text(seq + "\n")
    (results / seq).mkdir(parents=True)

    rng = np.random.RandomState(0)
    gts, preds = [], []
    for t in range(n_frames):
        gt = np.zeros((h, w), np.uint8)
        gt[10 + t:30 + t, 10:40] = 1
        gt[35:55, 40 + t:70 + t] = 2
        gt[:5, :5] = 255  # void region
        pred = np.zeros((h, w), np.uint8)
        pred[12 + t:31 + t, 9:38] = 1
        pred[36:57, 38 + t:69 + t] = 2
        if rng.rand() < 0.3:
            pred[20:25, 20:25] = 2  # noise blob
        gts.append(gt)
        preds.append(pred)
        _write_indexed(str(ann / f"{t:05d}.png"), gt)
        if t != 3:  # one missing prediction frame -> scored as empty
            _write_indexed(str(results / seq / f"{t:05d}.png"), pred)

    out = evaluate_davis(str(results), str(davis))

    # official protocol, computed independently: davis.py zeroes void labels
    # out of the GT, evaluation.py drops first+last frames, J['M']/F['M']
    # hold one entry per object track, global mean over tracks.
    all_j, all_f = [], []
    for o in (1, 2):
        js, fs = [], []
        for t in range(1, n_frames - 1):
            gt_o = np.where(gts[t] == 255, 0, gts[t]) == o
            pred_o = (np.zeros((h, w), bool) if t == 3
                      else preds[t] == o)
            js.append(_official_db_eval_iou(gt_o, pred_o))
            fs.append(_official_db_eval_boundary(pred_o, gt_o))
        all_j.append(np.mean(js))
        all_f.append(np.mean(fs))
    J, F = float(np.mean(all_j)), float(np.mean(all_f))

    assert abs(out["J-Mean"] - J) < 1e-6
    assert abs(out["F-Mean"] - F) < 1e-6
    assert abs(out["J&F-Mean"] - (J + F) / 2) < 1e-6


def test_resolution_mismatch_is_nearest_resized(tmp_path):
    """The official tool hard-fails on pred/GT shape mismatch; we document
    and pin the extension: predictions are NEAREST-resized to GT shape."""
    gt = _blobby_mask(7, h=96, w=128).astype(np.uint8)
    pred_small = _blobby_mask(9, h=48, w=64).astype(np.uint8)
    up = cv2.resize(pred_small, (128, 96), interpolation=cv2.INTER_NEAREST)
    direct = f_measure(up.astype(bool), gt.astype(bool))
    official = _official_db_eval_boundary(up.astype(bool), gt.astype(bool))
    assert abs(direct - official) < 1e-9
