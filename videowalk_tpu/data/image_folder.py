"""Image-dataset training: the reference's ImageFolder branch, made real.

Reference: code/train.py:179-180 ("HACK assume image dataset if data path is
a directory") routes any directory to ``torchvision.datasets.ImageFolder``.
There, each image becomes a 1-frame clip (code/utils/augs.py:21-22
``MapTransform`` wraps a PIL image as ``np.stack([transform(img)])``), the
palindrome walk over T=1 has no cycles, the loss is the constant empty sum —
and ``loss.backward()`` on a constant raises, so the shipped branch cannot
actually train.

Here the capability works: each image is expanded to a ``clip_len``-frame
*static clip* whose frames are independently augmented views of the image
(the train transform draws fresh crop/jitter/flip parameters per frame, see
data/augs.py TrainTransform._frame). The palindrome walk across those views
is a meaningful cycle-consistency objective on image datasets — synthetic
temporal augmentation. Item structure matches Kinetics400.__getitem__:
``(views, sp_mask, class_index)``, so both the patch and superpixel paths of
the train driver work unchanged.
"""

from __future__ import annotations

import os

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from videowalk_tpu.data.superpixels import compute_mask

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".ppm", ".tif",
                  ".tiff")


def is_image_folder(root: str) -> bool:
    """True when ``root`` looks like an image dataset: a directory whose
    class subdirectories contain image files (and no video files at the
    depth the Kinetics tree loader would scan)."""
    if not os.path.isdir(root):
        return False
    for cls in sorted(os.listdir(root)):
        sub = os.path.join(root, cls)
        if not os.path.isdir(sub):
            continue
        for f in os.listdir(sub):
            ext = os.path.splitext(f)[1].lower()
            if ext in IMG_EXTENSIONS:
                return True
            if ext in (".mp4", ".avi", ".mkv", ".webm", ".mov"):
                return False
    return False


class ImageFolder:
    """``<root>/<class>/*.jpg`` image dataset yielding static video clips.

    Args:
      root: dataset root (one subdirectory per class, torchvision layout).
      clip_len: frames per synthetic clip (--clip-len).
      transform: the 3-view train transform (data/augs.py). Its per-frame
        random draws are what de-correlate the clip's frames.
      sp_method/...: superpixel options, matching Kinetics400 (the mask is
        computed on the augmented views like the reference worker,
        code/data/kinetics.py:119-126).
    """

    def __init__(self, root: str, clip_len: int = 4, transform=None,
                 sp_method: str = "none", num_components: int = 30,
                 prob: float = 1.0, randomise_superpixels: bool = False,
                 randomise_superpixels_range: int = 0,
                 sp_backend: str = "host", seed: int | None = None):
        self.root = root
        self.clip_len = clip_len
        self.transform = transform
        self.sp_method = sp_method
        self.num_components = num_components
        self.prob = prob
        self.randomise_superpixels = randomise_superpixels
        self.randomise_superpixels_range = randomise_superpixels_range
        self.sp_backend = sp_backend
        self.compactness = 200.0
        # per-item rng streams in __getitem__ (thread-safe under the
        # concurrent loader; see data/kinetics.py)
        self.base_seed = (int(seed) if seed is not None
                          else int(np.random.SeedSequence().entropy
                                   % (2 ** 31)))

        self.classes = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d)))
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.samples: list[tuple[str, int]] = []
        for c in self.classes:
            sub = os.path.join(root, c)
            for f in sorted(os.listdir(sub)):
                if os.path.splitext(f)[1].lower() in IMG_EXTENSIONS:
                    self.samples.append((os.path.join(sub, f),
                                         self.class_to_idx[c]))
        if not self.samples:
            raise FileNotFoundError(f"no images under {root!r}")

    def set_compactness(self, c: float) -> None:
        self.compactness = float(c)

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int):
        path, label = self.samples[idx]
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise IOError(f"could not read image: {path}")
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        clip = np.stack([img] * self.clip_len)          # (T, H, W, 3) uint8

        rng = np.random.RandomState([self.base_seed, int(idx)])
        views = (self.transform(clip, rng=rng)
                 if self.transform is not None else
                 {"grid": clip, "whole": clip, "whole_unnorm": clip})

        if self.sp_method != "none" and self.sp_backend == "host":
            mask3 = compute_mask(
                views["whole_unnorm"], self.sp_method, self.num_components,
                self.prob, self.randomise_superpixels,
                self.randomise_superpixels_range, self.compactness,
                rng=rng)
            sp_mask = mask3[:, 0].astype(np.int32)
        else:
            sp_mask = np.zeros((0,), np.int32)

        return views, sp_mask, label
