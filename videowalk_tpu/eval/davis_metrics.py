"""DAVIS-2017 J&F metrics, in-repo.

The reference shells out to the external ``davis2017-evaluation`` repo
(Dockerfile:19-20, test.sh:30-32). This module implements the official
semi-supervised J&F protocol directly (Pont-Tuset et al., "The 2017 DAVIS
Challenge on Video Object Segmentation"):

- J  = region similarity: per-object per-frame IoU (empty/empty -> 1);
- F  = contour accuracy: precision/recall F-measure between ``seg2bmap``
  boundary pixels (east/south/south-east transition marks — the official
  definition, including background-side pixels), matched within a disk of
  radius ``ceil(0.008 * ||shape||)`` via binary dilation, exactly as the
  official ``db_eval_boundary``;
- semi-supervised protocol: frames 1..N-2 per object (first and last frames
  excluded); the global mean is over all (sequence, object) tracks, matching
  the official tool's J['M']/F['M'] aggregation.

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


def seg2bmap(seg: np.ndarray) -> np.ndarray:
    """Binary boundary map, official ``davis2017-evaluation`` semantics.

    A pixel is boundary iff it differs from its east, south, or south-east
    neighbor (transitions are marked on the north/west side, so boundary
    pixels can be *background* pixels adjacent to the object); the last
    row/column only compare east/south respectively and the corner is 0.
    This is the same-size path of the official ``_seg2bmap`` (the resampled
    path is never taken when evaluating at annotation resolution)."""
    seg = seg.astype(bool)
    e = np.zeros_like(seg)
    s = np.zeros_like(seg)
    se = np.zeros_like(seg)
    e[:, :-1] = seg[:, 1:]
    s[:-1, :] = seg[1:, :]
    se[:-1, :-1] = seg[1:, 1:]
    b = (seg ^ e) | (seg ^ s) | (seg ^ se)
    b[-1, :] = seg[-1, :] ^ e[-1, :]
    b[:, -1] = seg[:, -1] ^ s[:, -1]
    b[-1, -1] = False
    return b


def _disk(radius: int) -> np.ndarray:
    """skimage.morphology.disk: pixels with dx^2 + dy^2 <= r^2."""
    y, x = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    return (x * x + y * y <= radius * radius).astype(np.uint8)


def f_measure(pred: np.ndarray, gt: np.ndarray,
              bound_th: float = 0.008) -> float:
    """Boundary F-measure, official ``db_eval_boundary`` semantics:
    seg2bmap boundaries, disk-dilated tolerance matching
    (bound_pix = ceil(bound_th * ||shape||)), precision/recall harmonic mean.
    """
    fg = seg2bmap(pred)
    gtb = seg2bmap(gt)
    n_fg, n_gt = int(fg.sum()), int(gtb.sum())
    if n_fg == 0 and n_gt == 0:
        return 1.0
    if n_fg == 0 or n_gt == 0:
        # official: (P,R) = (1,0) or (0,1) -> F = 0
        return 0.0
    bound_pix = (int(bound_th) if bound_th >= 1 else
                 int(math.ceil(bound_th * np.linalg.norm(pred.shape))))
    se = _disk(bound_pix)
    fg_dil = cv2.dilate(fg.astype(np.uint8), se).astype(bool)
    gt_dil = cv2.dilate(gtb.astype(np.uint8), se).astype(bool)
    precision = np.logical_and(fg, gt_dil).sum() / n_fg
    recall = np.logical_and(gtb, fg_dil).sum() / n_gt
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


def _read_indexed(path: str) -> np.ndarray:
    return np.array(Image.open(path))


def evaluate_sequence(pred_dir: str, gt_dir: str
                      ) -> dict[int, dict[str, float]]:
    """Per-object mean J and F over frames 1..N-2 (semi-supervised protocol:
    the official tool drops the first and last frames)."""
    frames = sorted(f for f in os.listdir(gt_dir) if f.endswith(".png"))
    gt0 = _read_indexed(os.path.join(gt_dir, frames[0]))
    objects = sorted(int(o) for o in np.unique(gt0) if o not in (0, 255))
    if not objects:
        return {}

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

    return {o: {"J": float(np.mean(js[o])), "F": float(np.mean(fs[o]))}
            for o in objects}


def evaluate_davis(results_dir: str, davis_root: str,
                   split: str = "val") -> dict[str, float]:
    """Global J&F over the DAVIS-2017 split.

    Aggregation is per *object track* (the official tool's J['M']/F['M']
    lists hold one entry per (sequence, object); the global mean is over all
    of them), not per-sequence-then-mean."""
    val_list = os.path.join(davis_root, "ImageSets", "2017", f"{split}.txt")
    with open(val_list) as f:
        videos = [line.strip() for line in f if line.strip()]
    ann = os.path.join(davis_root, "Annotations", "480p")

    all_j: list[float] = []
    all_f: list[float] = []
    for v in videos:
        per_obj = evaluate_sequence(os.path.join(results_dir, v),
                                    os.path.join(ann, v))
        for o, scores in sorted(per_obj.items()):
            print(f"{v}_{o}: J={scores['J']:.4f} F={scores['F']:.4f}",
                  flush=True)
            all_j.append(scores["J"])
            all_f.append(scores["F"])
    if not all_j:
        # a broken evaluation (blank annotations, empty split, mis-rooted
        # dirs) must not masquerade as a perfect score
        raise ValueError(
            f"no object tracks evaluated: {len(videos)} sequence(s) from "
            f"{val_list} yielded zero first-frame object ids under {ann}")
    J = float(np.mean(all_j))
    F = float(np.mean(all_f))
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
