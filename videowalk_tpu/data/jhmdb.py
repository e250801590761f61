"""JHMDB pose dataset for keypoint propagation.

Parity surface with reference ``code/data/jhmdb.py`` (JhmdbSet): frame list
with ``videoLen`` frame-0 copies, shorter-side resize, ImageNet
normalization, pose keypoints from ``joint_positions.mat`` rendered as
Gaussian heatmaps at feature resolution (draw_labelmap_np, :287-319), plus a
background channel (:266). The reference has a latent missing
``scipy.io`` import (:231) — fixed here.
"""

from __future__ import annotations

import math
import os

import numpy as np
import scipy.io as sio

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from videowalk_tpu.data.vos import IMAGENET_MEAN, IMAGENET_STD, load_image, resize_hw


def draw_labelmap_np(img, pt, sigma, kind="Gaussian"):
    """Stamp a truncated 2D Gaussian (or Cauchy) bump into ``img`` at ``pt``.

    Matches the reference's heatmap semantics (jhmdb.py:287-319) exactly —
    the bump is centred on the *int-truncated* window origin plus half the
    window (not on ``pt`` itself), values inside the (6σ+1)-wide window
    overwrite the image, everything outside is untouched — but is computed
    as one whole-image mask assignment instead of ul/br box arithmetic.
    """
    h, w = img.shape
    # window bounds, int() truncation as in the reference (not floor)
    ux, uy = int(pt[0] - 3 * sigma), int(pt[1] - 3 * sigma)
    bx, by = int(pt[0] + 3 * sigma + 1), int(pt[1] + 3 * sigma + 1)
    if ux >= w or uy >= h or bx < 0 or by < 0:
        return img  # bump entirely off-image
    size = 6 * sigma + 1
    cx, cy = ux + size // 2, uy + size // 2  # quantized stamp centre
    xs = np.arange(w, dtype=float)[None, :]
    ys = np.arange(h, dtype=float)[:, None]
    d2 = (xs - cx) ** 2 + (ys - cy) ** 2
    if kind == "Gaussian":
        g = np.exp(-d2 / (2 * sigma ** 2))
    else:  # Cauchy
        g = sigma / ((d2 + sigma ** 2) ** 1.5)
    inside = (xs >= ux) & (xs < bx) & (ys >= uy) & (ys < by)
    img[inside] = g[inside]
    return img


class JhmdbSet:
    def __init__(self, args, sigma: float = 0.5):
        self.filelist = args.filelist
        self.imgSize = args.imgSize
        self.videoLen = args.videoLen
        self.mapScale = args.mapScale
        self.texture = args.texture
        self.round = args.round
        self.sigma = sigma
        self.workers = int(getattr(args, "workers", 0) or 0)

        self.jpgfiles, self.lblfiles = [], []
        with open(self.filelist) as f:
            for line in f:
                rows = line.split()
                if not rows:
                    continue
                self.jpgfiles.append(rows[0])
                self.lblfiles.append(rows[1])

    def __len__(self):
        return len(self.jpgfiles)

    def make_paths(self, folder_path):
        I = sorted((ll for ll in os.listdir(folder_path) if ".png" in ll),
                   key=lambda x: int(x.split(".")[0]))
        frame_num = len(I) + self.videoLen
        return [os.path.join(folder_path, I[max(0, i - self.videoLen)])
                for i in range(frame_num)]

    def __getitem__(self, index):
        folder_path = self.jpgfiles[index]
        label_path = self.lblfiles[index]
        img_paths = self.make_paths(folder_path)
        frame_num = len(img_paths)

        def _decode_one(p):
            img = load_image(p)
            ht, wd = img.shape[:2]
            if self.imgSize > 0:
                img = resize_hw(img, self.imgSize, self.imgSize)
            norm = ((img - np.asarray(IMAGENET_MEAN, np.float32))
                    / np.asarray(IMAGENET_STD, np.float32))
            return norm, img, (ht, wd)

        # videoLen prefix repeats frame 0's path: decode each unique frame
        # once, on a thread pool when --workers > 1 (shared contract with
        # VOSDataset)
        from videowalk_tpu.data.decode import decode_unique

        decoded = decode_unique(img_paths, _decode_one, self.workers)
        imgs = [decoded[p][0] for p in img_paths]
        imgs_orig = [decoded[p][1] for p in img_paths]
        ht, wd = decoded[img_paths[-1]][2]
        newh = neww = self.imgSize if self.imgSize > 0 else None
        if newh is None:
            newh, neww = ht, wd

        rsz_h = math.ceil(newh / self.mapScale[0])
        rsz_w = math.ceil(neww / self.mapScale[1])

        lbls_mat = sio.loadmat(label_path)
        lbls_coord = lbls_mat["pos_img"].astype(np.float64) - 1
        # scale to feature resolution. DELIBERATE DEVIATION from reference
        # jhmdb.py:238-239, which divides x by mapScale[0] (the HEIGHT
        # scale per its own rsz_h convention at :229) and y by mapScale[1]
        # — a latent axis swap, invisible because mapScale is always
        # uniform [s, s] in practice; paired correctly here.
        lbls_coord[0] = lbls_coord[0] * float(neww) / float(wd) / self.mapScale[1]
        lbls_coord[1] = lbls_coord[1] * float(newh) / float(ht) / self.mapScale[0]
        n_joints, n_frames = lbls_coord.shape[1], lbls_coord.shape[2]

        lbls = np.zeros((n_frames, rsz_h, rsz_w, n_joints))
        for i in range(n_frames):
            for j in range(n_joints):
                if self.sigma > 0:
                    draw_labelmap_np(lbls[i, :, :, j], lbls_coord[:, j, i],
                                     self.sigma)
                else:
                    tx, ty = int(lbls_coord[0, j, i]), int(lbls_coord[1, j, i])
                    if 0 <= tx < rsz_w and 0 <= ty < rsz_h:
                        lbls[i, ty, tx, j] = 1.0

        lbls_tensor = np.zeros((frame_num, rsz_h, rsz_w, n_joints),
                               np.float32)
        for i in range(frame_num):
            src = 0 if i < self.videoLen else min(i - self.videoLen,
                                                  len(lbls) - 1)
            lbls_tensor[i] = lbls[src]
        # background channel (reference jhmdb.py:266)
        bg = (lbls_tensor.sum(-1) == 0)[..., None].astype(np.float32)
        lbls_tensor = np.concatenate([bg, lbls_tensor], axis=-1)

        from matplotlib import cm

        # DELIBERATE DEVIATION from reference jhmdb.py:269 (cm.Paired(i)
        # with integer i): Paired has 12 entries, so joints 12..14 all
        # clamped to the same color there — i % 12 keeps every mask color
        # distinct (visualization only; pose eval reads the .dat coords)
        lblset = np.array([[0, 0, 0]] + [cm.Paired(i % 12)[:3]
                                         for i in range(n_joints)]) * 255.0

        meta = dict(folder_path=folder_path, img_paths=img_paths,
                    lbl_paths=[])
        imgs = np.stack(imgs).astype(np.float32)
        imgs_orig = np.stack(imgs_orig).astype(np.float32)
        return imgs, imgs_orig, lbls_tensor, lbls_tensor, lblset, meta
