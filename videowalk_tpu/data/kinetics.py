"""Kinetics-style clip dataset over ``<root>/<class>/*.mp4``.

Parity surface with reference ``code/data/kinetics.py`` (Kinetics400):
directory scan + clip index, per-item decode -> 3-view transform ->
optional superpixel mask, decode-failure retry with a fresh random index
(:102-112), and the ``set_compactness`` runtime knob (:96-100).

TPU-first difference: when ``sp_backend='device'`` the dataset skips host
segmentation entirely and the trainer runs the batched on-device SLIC
(videowalk_tpu/ops/slic_device.py) on the unnormalized view — removing the
reference's CPU worker bottleneck.
"""

from __future__ import annotations

import os

import numpy as np

from videowalk_tpu.data.clips import VideoClipIndex
from videowalk_tpu.data.superpixels import compute_mask

VIDEO_EXTENSIONS = (".mp4", ".avi", ".webm", ".mov", ".mkv")


def find_videos(root: str, extensions=VIDEO_EXTENSIONS):
    """``<root>/<class>/*.ext`` -> (paths, labels, classes), sorted like
    torchvision's make_dataset (code/data/kinetics.py:68-76)."""
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    paths, labels = [], []
    for ci, cls in enumerate(classes):
        cdir = os.path.join(root, cls)
        for fname in sorted(os.listdir(cdir)):
            if fname.lower().endswith(tuple(extensions)):
                paths.append(os.path.join(cdir, fname))
                labels.append(ci)
    return paths, labels, classes


class Kinetics400:
    def __init__(
        self,
        root: str,
        frames_per_clip: int,
        step_between_clips: int = 1,
        frame_rate: float | None = None,
        extensions=VIDEO_EXTENSIONS,  # reference pins ('mp4',)
                                      # (code/train.py:168); accepting the
                                      # module's advertised list avoids
                                      # silent empty datasets on avi/webm
                                      # mirrors
        transform=None,
        _precomputed_metadata: dict | None = None,
        sp_method: str = "slic",
        num_components: int = 30,
        prob: float = 1.0,
        randomise_superpixels: bool = False,
        randomise_superpixels_range: int = 10,
        sp_backend: str = "host",
        seed: int | None = None,
    ):
        exts = tuple(e if e.startswith(".") else "." + e for e in extensions)
        self.root = root
        self.video_list, self.labels, self.classes = find_videos(root, exts)
        self.samples = list(zip(self.video_list, self.labels))
        self.video_clips = VideoClipIndex(
            self.video_list, frames_per_clip, step_between_clips, frame_rate,
            _metadata=_precomputed_metadata)
        self.transform = transform
        self.sp_method = sp_method
        self.num_components = num_components
        self.prob = prob
        self.randomise_superpixels = randomise_superpixels
        self.randomise_superpixels_range = randomise_superpixels_range
        self.sp_backend = sp_backend
        self.compactness = 100
        # per-ITEM rng streams (see __getitem__): the threaded DataLoader
        # calls __getitem__ concurrently, and one shared RandomState is not
        # thread-safe (corrupted/duplicated draws). A fresh base is drawn
        # when no seed is given so distinct unseeded datasets still differ.
        self.base_seed = (int(seed) if seed is not None
                          else int(np.random.SeedSequence().entropy
                                   % (2 ** 31)))
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Advance the per-item RNG streams: without the epoch in the seed,
        a clip index revisited in a later epoch would replay the exact same
        decode window and augmentation draws (the reference gets fresh
        draws from its per-worker torch RNGs)."""
        self._epoch = int(epoch)

    def __len__(self):
        return self.video_clips.num_clips()

    # runtime compactness knob (reference code/data/kinetics.py:96-100)
    def set_compactness(self, compactness):
        self.compactness = compactness

    def get_compactness(self):
        return self.compactness

    def __getitem__(self, idx: int):
        # deterministic per-(epoch, item) stream: thread-safe under the
        # concurrent loader AND worker-count-independent (the reference's
        # per-process DataLoader RNGs make draws depend on the worker
        # schedule); the epoch term keeps revisited indices fresh
        rng = np.random.RandomState([self.base_seed, self._epoch, int(idx)])
        if len(self) == 0:
            raise RuntimeError(
                f"dataset at {self.root} contains no clips (no video files "
                f"matched, or every video is shorter than frames_per_clip)")
        # decode-failure resilience: retry with fresh random index
        # (code/data/kinetics.py:102-112)
        for _ in range(100):
            try:
                video, info, video_idx = self.video_clips.get_clip(idx)
                break
            except Exception as e:  # noqa: BLE001 — any decode failure
                print("skipped idx", idx, "Error:", e, flush=True)
                idx = int(rng.randint(len(self)))
        else:
            raise RuntimeError("could not decode any clip after 100 retries")

        label = self.labels[video_idx]

        views = (self.transform(video, rng=rng)
                 if self.transform is not None else
                 {"grid": video, "whole": video, "whole_unnorm": video})

        if self.sp_method != "none" and self.sp_backend == "host":
            # host path computes the mask here like the reference worker;
            # compute_mask wants (T, H, W, C) -> returns (T, 3, h, w)
            mask3 = compute_mask(
                views["whole_unnorm"], self.sp_method, self.num_components,
                self.prob, self.randomise_superpixels,
                self.randomise_superpixels_range, self.compactness,
                rng=rng)
            sp_mask = mask3[:, 0].astype(np.int32)     # (T, h, w) dense ids
        else:
            sp_mask = np.zeros((0,), np.int32)          # device path / none

        return views, sp_mask, label
