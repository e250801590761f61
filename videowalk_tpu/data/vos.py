"""DAVIS-style VOS dataset for label propagation.

Parity surface with reference ``code/data/vos.py`` (VOSDataset):

- filelist of ``<jpeg_dir> <annotation_dir>`` lines (:116-128);
- ``videoLen`` copies of frame 0 prepended (:148-156);
- shorter-side resize to ``imgSize`` (:186-202), ImageNet normalization
  (:173, :214) — note eval uses ImageNet stats, train uses CIFAR-style;
- label set from frame 0's unique colors (:68-75, collapsed to single
  channel when the palette is consecutive, :232-233);
- one-hot + feature-resolution-resized label caches saved next to the data
  (``*_onehot.npy`` / ``*_size{h}x{w}.npy``, :247-263);
- ``texturize`` striped-label mode (:77-101) and LAB color for uvc (:206-212).
"""

from __future__ import annotations

import math
import os

import numpy as np

from videowalk_tpu.utils.colors import pack_rgb

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def load_image(path: str) -> np.ndarray:
    """BGR file -> float32 RGB (H, W, 3) in [0, 1] (reference vos.py:44-51)."""
    img = cv2.imread(path)
    if img is None:
        raise IOError(f"cannot read image: {path}")
    return (img.astype(np.float32) / 255.0)[:, :, ::-1].copy()


def resize_hw(img: np.ndarray, h: int, w: int,
              interp=None) -> np.ndarray:
    interp = interp if interp is not None else cv2.INTER_LINEAR
    return cv2.resize(img, (w, h), interpolation=interp)


def make_lbl_set(lbls: np.ndarray) -> np.ndarray:
    """Unique frame-0 colors as the label set (reference vos.py:68-75).

    3-channel uint8 rows are packed into one uint32 per pixel before
    ``np.unique`` — same set, same lexicographic order (channel 0 is the
    most significant byte), ~30x faster than row-wise unique at 480p.
    """
    flat = lbls[0].reshape(-1, lbls.shape[-1]).astype(np.uint8)
    if flat.shape[-1] != 3:
        return np.unique(flat, axis=0)
    u = np.unique(pack_rgb(flat))
    return np.stack([(u >> 16) & 0xFF, (u >> 8) & 0xFF, u & 0xFF],
                    axis=-1).astype(np.uint8)


def onehot_from_lblset(lbl: np.ndarray, lblset: np.ndarray) -> np.ndarray:
    """Per-pixel one-hot against the label set (reference vos.py:241-244's
    ``np.all(lbl == color, axis=-1)`` loop). 3-channel uint8 colors compare
    as packed uint32 — one pass over the frame per label instead of three
    plus an ``np.all`` reduction (~4x at 480p); other shapes fall back to
    the reference formulation. Output is boolean, identical either way."""
    if lbl.shape[-1] == 3 and lblset.shape[-1] == 3:
        packed = pack_rgb(lbl.astype(np.uint8))
        skey = pack_rgb(lblset.astype(np.uint8))
        return packed[..., None] == skey
    return np.stack([np.all(lbl == ll, axis=-1) for ll in lblset], axis=-1)


def texturize(onehot: np.ndarray) -> np.ndarray:
    """Striped-label mode (reference vos.py:77-101): rows where any object
    appears are split into up to 10 horizontal stripes."""
    hidxs = [h for h in range(onehot.shape[0])
             if np.any(onehot[h, :, 1:] == 1)]
    nstripes = min(10, len(hidxs))
    out = np.zeros((*onehot.shape[:2], nstripes + 1))
    out[:, :, 0] = 1
    for i, h in enumerate(hidxs):
        cidx = int(i // (len(hidxs) / nstripes))
        w = np.any(onehot[h, :, 1:] == 1, axis=-1)
        out[h][w] = 0
        out[h][w, cidx + 1] = 1
    return out


def try_np_load(p):
    try:
        return np.load(p)
    except Exception:
        return None


class VOSDataset:
    def __init__(self, args):
        self.filelist = args.filelist
        self.imgSize = args.imgSize
        self.videoLen = args.videoLen
        self.mapScale = args.mapScale
        self.texture = args.texture
        self.round = args.round
        self.use_lab = getattr(args, "use_lab", False)
        # --workers N > 1: decode a video's unique frames on a thread pool
        # (cv2 releases the GIL in imread/resize/cvtColor). The reference
        # gets the same effect from torch DataLoader workers
        # (code/test.py:57-60); here the pool lives inside __getitem__ so
        # the CLI's cross-video prefetch thread stays the only consumer.
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

    def make_paths(self, folder_path, label_path):
        """Frame paths with ``videoLen`` frame-0 copies prepended
        (reference vos.py:138-156)."""
        I = sorted(os.listdir(folder_path), key=lambda x: int(x.split(".")[0]))
        L = sorted((ll for ll in os.listdir(label_path) if "npy" not in ll),
                   key=lambda x: int(x.split(".")[0]))
        frame_num = len(I) + self.videoLen
        I_out, L_out = [], []
        for i in range(frame_num):
            i = max(0, i - self.videoLen)
            I_out.append(os.path.join(folder_path, I[i]))
            L_out.append(os.path.join(label_path, L[i]))
        return I_out, L_out

    def __getitem__(self, index):
        folder_path = self.jpgfiles[index]
        label_path = self.lblfiles[index]
        img_paths, lbl_paths = self.make_paths(folder_path, label_path)
        frame_num = len(img_paths)

        # At the config of record (--cropSize -1: no resize) with standard
        # color, frames stay RAW uint8 RGB; the ImageNet normalization runs
        # on device inside the encode jit (cli/test.py::_encode_batch) —
        # bitwise the same f32 arithmetic, 4x less host work + host->device
        # traffic than shipping normalized float32 (the reference normalizes
        # on host, code/data/vos.py:173,214).
        raw_u8 = self.imgSize <= 0 and not self.use_lab

        def _decode_one(pair):
            """(img_path, lbl_path) -> (img, img_orig, lblimg)."""
            ip, lp = pair
            if raw_u8:
                bgr = cv2.imread(ip)
                if bgr is None:
                    raise IOError(f"cannot read image: {ip}")
                img = np.ascontiguousarray(bgr[:, :, ::-1])  # uint8 RGB
                return img, img, cv2.imread(lp)
            img = load_image(ip)
            lblimg = cv2.imread(lp)
            if self.imgSize > 0:
                # shorter-side resize (reference vos.py:186-202; the
                # reference's ratio is hardcoded 1.0, i.e. square resize)
                newh = neww = self.imgSize
                img = resize_hw(img, newh, neww)
                lblimg = cv2.resize(lblimg, (neww, newh),
                                    interpolation=cv2.INTER_NEAREST)
            img_orig = img
            if self.use_lab:
                u8 = (img * 255).astype(np.uint8)[:, :, ::-1]  # RGB->BGR
                lab = cv2.cvtColor(u8, cv2.COLOR_BGR2LAB)
                lab = (lab.astype(np.float32) - 128.0) / 128.0
                img = np.stack([lab[..., 0]] * 3, axis=-1)
            else:
                img = ((img - np.asarray(IMAGENET_MEAN, np.float32))
                       / np.asarray(IMAGENET_STD, np.float32))
            return img, img_orig, lblimg

        # the videoLen prefix repeats frame 0's paths; decode each unique
        # frame once (the reference re-reads frame 0 videoLen+1 times,
        # ~0.2 s/video at 480p), on a thread pool when --workers > 1
        from videowalk_tpu.data.decode import decode_unique

        decoded = decode_unique(list(zip(img_paths, lbl_paths)), _decode_one,
                                self.workers)
        imgs, imgs_orig, lbls = [], [], []
        for pair in zip(img_paths, lbl_paths):
            img, img_orig, lblimg = decoded[pair]
            imgs.append(img)
            imgs_orig.append(img_orig)
            lbls.append(lblimg)

        meta = dict(folder_path=folder_path, img_paths=img_paths,
                    lbl_paths=lbl_paths)
        lbls = np.stack(lbls)

        lblset = make_lbl_set(lbls)
        if lblset.shape[0] > 1 and np.all((lblset[1:] - lblset[:-1]) == 1):
            lblset = lblset[:, 0:1]  # consecutive palette -> single channel

        rsz_h = math.ceil(imgs[0].shape[0] / self.mapScale[0])
        rsz_w = math.ceil(imgs[0].shape[1] / self.mapScale[1])

        # only the resized one-hots are consumed downstream (the reference
        # also builds a full-res `onehots` list it never returns,
        # code/data/vos.py:242-289 — dropped here)
        resizes = []
        _lbl_cache: dict = {}
        for i, p in enumerate(lbl_paths):
            cached = _lbl_cache.get(p)
            if cached is not None:  # videoLen prefix repeats frame 0's label
                resizes.append(cached)
                continue
            prefix = os.path.splitext(p)[0]
            oh_path = f"{prefix}_onehot.npy"
            rz_path = f"{prefix}_size{rsz_h}x{rsz_w}.npy"
            onehot = try_np_load(oh_path)
            if onehot is None:
                onehot = onehot_from_lblset(lbls[i], lblset)
                try:
                    np.save(oh_path, onehot)
                except OSError:
                    pass
            resized = try_np_load(rz_path)
            if resized is None:
                resized = cv2.resize(np.float32(onehot), (rsz_w, rsz_h),
                                     interpolation=cv2.INTER_LINEAR)
                try:
                    np.save(rz_path, resized)
                except OSError:
                    pass
            _lbl_cache[p] = resized
            if self.texture:
                texturized = texturize(resized)
                resizes.append(texturized)
                from matplotlib import cm

                lblset = np.array(
                    [[0, 0, 0]] + [cm.Paired(i)[:3]
                                   for i in range(texturized.shape[-1])]) * 255.0
                break
            resizes.append(resized)

        if self.texture:
            resizes = resizes * self.videoLen
            for _ in range(len(lbl_paths) - self.videoLen):
                resizes.append(np.zeros(resizes[0].shape))

        if raw_u8:
            # uint8 through and through; consumers scale at use site
            # (cli/test.py) — avoids two ~300 MB f32 copies per 480p video
            imgs = np.stack(imgs)
            imgs_orig = imgs
        else:
            imgs = np.stack(imgs).astype(np.float32)
            imgs_orig = np.stack(imgs_orig).astype(np.float32)
        lbls_resize = np.stack(resizes).astype(np.float32)
        return imgs, imgs_orig, lbls_resize, lbls, lblset, meta
