"""JHMDB PCK@{0.1..0.5} from dumped ``.dat`` keypoints.

Parity surface with reference ``code/eval/eval_pck.py``: read GT
``joint_positions.mat`` coordinates (0-indexed), rescale predictions from
feature resolution (feat_res=40) to image size, normalize distances by 0.6x
the GT bounding-box diagonal per frame, skip frame 0 and invisible joints,
report per-threshold mean-over-joints PCK.

CLI: python -m videowalk_tpu.eval.eval_pck --filelist <list> --src <preds>
"""

from __future__ import annotations

import argparse

import numpy as np
import scipy.io as sio

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

FEAT_RES = 40
THRESHOLDS = (0.1, 0.2, 0.3, 0.4, 0.5)


def load_gt(filelist: str):
    import os

    gts, heights, widths = [], [], []
    with open(filelist) as f:
        for line in f:
            rows = line.strip().split()
            if not rows:
                continue
            lbls_mat = sio.loadmat(rows[1])
            gts.append(lbls_mat["pos_img"].astype(np.float64) - 1)
            # the reference hardcodes '00001.png' (eval_pck.py:32); fall
            # back to the first image in the folder, and fail NAMING the
            # path instead of 'NoneType has no attribute shape'
            imgpath = rows[0] + "/00001.png"
            if not os.path.exists(imgpath):
                cands = sorted(
                    f for f in os.listdir(rows[0])
                    if f.lower().endswith((".png", ".jpg", ".jpeg")))
                if not cands:
                    raise IOError(f"no frames found under {rows[0]}")
                imgpath = os.path.join(rows[0], cands[0])
            img = cv2.imread(imgpath)
            if img is None:
                raise IOError(f"could not read frame {imgpath}")
            heights.append(img.shape[0])
            widths.append(img.shape[1])
    return gts, heights, widths


def compute_pck(filelist: str, src_folder: str,
                thresholds=THRESHOLDS,
                feat_res=(FEAT_RES, FEAT_RES)) -> dict[float, float]:
    """PCK from dumped keypoints.

    Args:
      feat_res: (W_feat, H_feat) of the grid the keypoints live on. The
        reference hardcodes 40 for both axes — correct ONLY for its
        cropSize-320 square eval (320/8). For any other eval geometry
        (cropSize -1 native 320x240 -> (40, 30), cropSize 480 -> (60, 60))
        pass the true grid, else every coordinate is silently rescaled by
        the wrong factor and PCK is biased with no error.
    """
    wf, hf = feat_res
    gts, heights, widths = load_gt(filelist)

    dist_all = {p: [] for p in range(15)}
    for i, gt in enumerate(gts):
        pred = np.load(f"{src_folder.rstrip('/')}/{i}.dat",
                       allow_pickle=True).astype(np.float64)
        visible = (pred[0] >= 0)
        pred = pred.copy()
        pred[0] = pred[0] / wf * widths[i]
        pred[1] = pred[1] / hf * heights[i]

        n_joints, n_frames = gt.shape[1], min(gt.shape[2], pred.shape[2])
        # per-frame normalization: 0.6 * bbox diagonal over visible joints
        boxes = np.zeros(n_frames)
        for k in range(n_frames):
            vis = visible[:, k][:n_joints]
            if not vis.any():
                boxes[k] = 1.0
                continue
            pts = gt[:, :n_joints, k][:, vis]
            boxes[k] = 0.6 * np.linalg.norm(
                [pts[0].max() - pts[0].min(), pts[1].max() - pts[1].min()])

        for j in range(n_joints):
            for k in range(1, n_frames):  # skip frame 0 (reference :116-117)
                if not visible[j, k]:
                    continue
                d = np.linalg.norm(pred[:2, j, k] - gt[:2, j, k])
                dist_all[j].append(d / max(boxes[k], 1e-12))

    results = {}
    for th in thresholds:
        pcks = [100.0 * np.mean(np.asarray(dist_all[p]) <= th)
                for p in range(15) if dist_all[p]]
        results[th] = float(np.mean(pcks))
        print(f"{th}: {results[th]:.2f}")
    return results


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--filelist", required=True)
    parser.add_argument("--src", required=True,
                        help="folder with {i}.dat prediction files")
    parser.add_argument("--feat-res", nargs="+", type=int,
                        default=[FEAT_RES],
                        help="W [H] of the keypoint feature grid (reference "
                             "default 40 40 = its cropSize-320 eval; pass "
                             "the true grid for other geometries, e.g. "
                             "'40 30' for native 320x240 JHMDB)")
    args = parser.parse_args(argv)
    fr = args.feat_res
    compute_pck(args.filelist, args.src,
                feat_res=(fr[0], fr[1] if len(fr) > 1 else fr[0]))


if __name__ == "__main__":
    main()
