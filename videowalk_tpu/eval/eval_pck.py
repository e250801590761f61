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
    gts, heights, widths = [], [], []
    with open(filelist) as f:
        for line in f:
            rows = line.strip().split()
            if not rows:
                continue
            lbls_mat = sio.loadmat(rows[1])
            gts.append(lbls_mat["pos_img"].astype(np.float64) - 1)
            img = cv2.imread(rows[0] + "/00001.png")
            heights.append(img.shape[0])
            widths.append(img.shape[1])
    return gts, heights, widths


def compute_pck(filelist: str, src_folder: str,
                thresholds=THRESHOLDS) -> dict[float, float]:
    gts, heights, widths = load_gt(filelist)

    dist_all = {p: [] for p in range(15)}
    for i, gt in enumerate(gts):
        pred = np.load(f"{src_folder.rstrip('/')}/{i}.dat",
                       allow_pickle=True).astype(np.float64)
        visible = (pred[0] >= 0)
        pred = pred.copy()
        pred[0] = pred[0] / FEAT_RES * widths[i]
        pred[1] = pred[1] / FEAT_RES * heights[i]

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
    args = parser.parse_args(argv)
    compute_pck(args.filelist, args.src)


if __name__ == "__main__":
    main()
