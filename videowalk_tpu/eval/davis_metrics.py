"""DAVIS-2017 J&F metrics, in-repo.

The reference shells out to the external ``davis2017-evaluation`` repo
(Dockerfile:19-20, test.sh:30-32). This module implements the official
semi-supervised J&F protocol directly (Pont-Tuset et al., "The 2017 DAVIS
Challenge on Video Object Segmentation"):

- J  = region similarity: per-object per-frame IoU;
- F  = contour accuracy: precision/recall F-measure between boundary pixels,
  matched within a distance tolerance (morphological dilation of the
  boundary maps, bound = ceil(0.008 * diagonal));
- per-sequence scores average over frames 1..N-2 (first and last frames are
  excluded, matching the official tool), then mean over objects/sequences.

CLI: python -m videowalk_tpu.eval.davis_metrics \
        --results <indexed PNGs per video> --davis <DAVIS root>
"""

from __future__ import annotations

import argparse
import math
import os

import numpy as np

try:
    import cv2
    from PIL import Image
except Exception:  # pragma: no cover
    cv2 = Image = None


def jaccard(pred: np.ndarray, gt: np.ndarray) -> float:
    """IoU for one object mask pair; empty/empty scores 1."""
    inter = np.logical_and(pred, gt).sum()
    union = np.logical_or(pred, gt).sum()
    if union == 0:
        return 1.0
    return float(inter) / float(union)


def _boundary_map(mask: np.ndarray) -> np.ndarray:
    """Binary boundary of a mask (pixels whose 4-neighborhood crosses the
    mask edge) — matches the official `seg2bmap` up to raster alignment."""
    mask = mask.astype(np.uint8)
    if mask.sum() == 0:
        return np.zeros_like(mask, bool)
    er = cv2.erode(mask, np.ones((3, 3), np.uint8))
    return (mask - er).astype(bool)


def f_measure(pred: np.ndarray, gt: np.ndarray,
              bound_th: float = 0.008) -> float:
    """Boundary F-measure with distance tolerance (official protocol)."""
    fg = _boundary_map(pred)
    gtb = _boundary_map(gt)
    if fg.sum() == 0 and gtb.sum() == 0:
        return 1.0
    if fg.sum() == 0 or gtb.sum() == 0:
        return 0.0
    bound_pix = max(1, int(math.ceil(
        bound_th * np.linalg.norm(pred.shape))))
    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE,
                                   (2 * bound_pix + 1, 2 * bound_pix + 1))
    fg_dil = cv2.dilate(fg.astype(np.uint8), se).astype(bool)
    gt_dil = cv2.dilate(gtb.astype(np.uint8), se).astype(bool)
    precision = np.logical_and(fg, gt_dil).sum() / fg.sum()
    recall = np.logical_and(gtb, fg_dil).sum() / gtb.sum()
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


def _read_indexed(path: str) -> np.ndarray:
    return np.array(Image.open(path))


def evaluate_sequence(pred_dir: str, gt_dir: str) -> dict[str, float]:
    """Per-sequence mean J and F over objects, frames 1..N-2."""
    frames = sorted(f for f in os.listdir(gt_dir) if f.endswith(".png"))
    gt0 = _read_indexed(os.path.join(gt_dir, frames[0]))
    objects = sorted(int(o) for o in np.unique(gt0) if o not in (0, 255))
    if not objects:
        return {"J": 1.0, "F": 1.0}

    js = {o: [] for o in objects}
    fs = {o: [] for o in objects}
    for fname in frames[1:-1]:  # official: skip first & last frame
        gt = _read_indexed(os.path.join(gt_dir, fname))
        pred_path = os.path.join(pred_dir, fname)
        pred = (_read_indexed(pred_path) if os.path.exists(pred_path)
                else np.zeros_like(gt))
        if pred.shape != gt.shape:
            pred = cv2.resize(pred.astype(np.uint8),
                              (gt.shape[1], gt.shape[0]),
                              interpolation=cv2.INTER_NEAREST)
        for o in objects:
            js[o].append(jaccard(pred == o, gt == o))
            fs[o].append(f_measure(pred == o, gt == o))

    j_mean = float(np.mean([np.mean(js[o]) for o in objects]))
    f_mean = float(np.mean([np.mean(fs[o]) for o in objects]))
    return {"J": j_mean, "F": f_mean}


def evaluate_davis(results_dir: str, davis_root: str,
                   split: str = "val") -> dict[str, float]:
    """Global J&F over the DAVIS-2017 split."""
    val_list = os.path.join(davis_root, "ImageSets", "2017", f"{split}.txt")
    with open(val_list) as f:
        videos = [line.strip() for line in f if line.strip()]
    ann = os.path.join(davis_root, "Annotations", "480p")

    per_seq = {}
    for v in videos:
        per_seq[v] = evaluate_sequence(os.path.join(results_dir, v),
                                       os.path.join(ann, v))
        print(f"{v}: J={per_seq[v]['J']:.4f} F={per_seq[v]['F']:.4f}",
              flush=True)
    J = float(np.mean([s["J"] for s in per_seq.values()]))
    F = float(np.mean([s["F"] for s in per_seq.values()]))
    out = {"J&F-Mean": (J + F) / 2, "J-Mean": J, "F-Mean": F}
    print({k: round(v, 4) for k, v in out.items()}, flush=True)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--results", required=True)
    parser.add_argument("--davis", required=True)
    parser.add_argument("--split", default="val")
    args = parser.parse_args(argv)
    evaluate_davis(args.results, args.davis, args.split)


if __name__ == "__main__":
    main()
