"""Video clip indexing and sampling (torchvision VideoClips equivalent).

The reference indexes mp4s with torchvision's ``VideoClips`` (PyAV-backed)
and samples with ``RandomClipSampler`` (code/data/kinetics.py:78-84,
code/train.py:217-218). This environment has no PyAV; decode goes through
OpenCV's ffmpeg backend. Semantics preserved:

- per-video frame-accurate clip windows of ``frames_per_clip`` frames,
  ``step_between_clips`` apart, after optional fps resampling
  (torchvision's _resample_video_idx floor-arange rule);
- metadata (frame counts/fps) computed once and cacheable
  (code/train.py:191-206);
- ``RandomClipSampler``: at most ``max_clips_per_video`` random clips per
  video, order shuffled across videos.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
import random
from typing import Sequence

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _probe(path: str) -> tuple[int, float]:
    """(frame_count, fps) for a video file."""
    cap = cv2.VideoCapture(path)
    try:
        if not cap.isOpened():
            raise IOError(f"cannot open video: {path}")
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        fps = float(cap.get(cv2.CAP_PROP_FPS)) or 30.0
        return n, fps
    finally:
        cap.release()


def resample_idx(num_frames: int, original_fps: float, new_fps: float | None
                 ) -> np.ndarray:
    """torchvision VideoClips._resample_video_idx rule."""
    if new_fps is None or original_fps <= 0:
        return np.arange(num_frames)
    step = original_fps / new_fps
    if step.is_integer():
        return np.arange(0, num_frames, int(step))
    total = int(num_frames / step)
    return (np.arange(total) * step).astype(np.int64)


@dataclasses.dataclass
class VideoClipIndex:
    """Frame-accurate clip index over a list of video files."""

    video_paths: list
    frames_per_clip: int
    step_between_clips: int = 1
    frame_rate: float | None = None
    _metadata: dict | None = None

    def __post_init__(self):
        if self._metadata is not None:
            # cached counts pair with videos POSITIONALLY — applying a cache
            # from a tree that gained/lost/reordered files would silently
            # compute clip windows from the wrong video's frame count
            cached_paths = self._metadata.get("video_paths")
            if (cached_paths is not None
                    and list(cached_paths) != list(self.video_paths)):
                raise ValueError(
                    "cached dataset metadata does not match the current "
                    "video tree (files added/removed/reordered since the "
                    "cache was written) — delete the cache file or point "
                    "--cache-path elsewhere")
            self.video_frames = list(self._metadata["video_frames"])
            self.video_fps = list(self._metadata["video_fps"])
        else:
            if cv2 is None and self.video_paths:
                raise RuntimeError("opencv-python (cv2) is required to "
                                   "probe video metadata and failed to "
                                   "import")
            self.video_frames, self.video_fps = [], []
            failed = []
            for p in self.video_paths:
                try:
                    n, fps = _probe(p)
                except Exception as e:
                    # skip the video (reference behavior: corrupt videos are
                    # tolerated) but say so — a silent (0, 30) made whole
                    # classes vanish from the index with no diagnostics
                    failed.append((p, e))
                    n, fps = 0, 30.0
                self.video_frames.append(n)
                self.video_fps.append(fps)
            if failed:
                shown = "; ".join(f"{p} ({e})" for p, e in failed[:5])
                print(f"WARNING: {len(failed)} of {len(self.video_paths)} "
                      f"videos failed to probe and are excluded from the "
                      f"clip index: {shown}"
                      + ("; ..." if len(failed) > 5 else ""), flush=True)
                if len(failed) == len(self.video_paths):
                    raise RuntimeError(
                        "every video failed to probe — check codecs/"
                        "permissions (first error: "
                        f"{failed[0][0]}: {failed[0][1]})")
        self.compute_clips(self.frames_per_clip, self.step_between_clips,
                           self.frame_rate)

    def metadata(self) -> dict:
        return {"video_paths": list(self.video_paths),
                "video_frames": list(self.video_frames),
                "video_fps": list(self.video_fps)}

    def save_metadata(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(self.metadata(), f)

    @staticmethod
    def load_metadata(path: str) -> dict:
        with open(path, "rb") as f:
            return pickle.load(f)

    def compute_clips(self, frames_per_clip: int, step: int,
                      frame_rate: float | None = None) -> None:
        """(Re)build the clip table (torchvision compute_clips,
        used at code/train.py:209)."""
        self.frames_per_clip = frames_per_clip
        self.step_between_clips = step
        self.frame_rate = frame_rate
        self.clips: list[np.ndarray] = []   # per video: (n_clips, T) frame idx
        self.cumulative = [0]
        for vi, n in enumerate(self.video_frames):
            idxs = resample_idx(n, self.video_fps[vi], frame_rate)
            n_clips = max(0, (len(idxs) - frames_per_clip) // step + 1)
            windows = (np.arange(frames_per_clip)[None, :]
                       + step * np.arange(n_clips)[:, None])
            self.clips.append(idxs[windows] if n_clips > 0
                              else np.zeros((0, frames_per_clip), np.int64))
            self.cumulative.append(self.cumulative[-1] + n_clips)

    def num_clips(self) -> int:
        return self.cumulative[-1]

    def get_clip_location(self, idx: int) -> tuple[int, int]:
        vi = int(np.searchsorted(self.cumulative, idx, side="right")) - 1
        return vi, idx - self.cumulative[vi]

    def get_clip(self, idx: int) -> tuple[np.ndarray, dict, int]:
        """Decode clip ``idx`` -> (frames (T, H, W, 3) uint8 RGB, info, video_idx)."""
        if not 0 <= idx < self.num_clips():
            # a negative idx would searchsorted to the LAST video and decode
            # the wrong clip without error
            raise IndexError(idx)
        vi, ci = self.get_clip_location(idx)
        frame_idxs = self.clips[vi][ci]
        frames = decode_frames(self.video_paths[vi], frame_idxs)
        return frames, {"video_fps": self.video_fps[vi]}, vi


def decode_frames(path: str, frame_idxs: Sequence[int]) -> np.ndarray:
    """Decode specific frames from a video file (RGB uint8).

    Seeks to the earliest needed frame, then reads sequentially. NOTE on
    seek accuracy: cv2's FFmpeg backend reports CAP_PROP_POS_FRAMES as the
    value just set whether or not the seek landed there, so it CANNOT be
    verified post-hoc — there is no cheap landed-check (an earlier version
    pretended to have one). For constant-frame-rate H.264/mp4 (the Kinetics
    distribution format) FFmpeg's seek is frame-accurate, pinned by
    tests/test_data.py::test_decode_frames_seek_matches_sequential; for
    VFR or exotic containers set ``VIDEOWALK_SEQ_DECODE=1`` to force a
    grab() skim from frame 0 (exact everywhere, O(first) per clip).
    """
    frame_idxs = np.asarray(frame_idxs)
    first, last = int(frame_idxs.min()), int(frame_idxs.max())
    cap = cv2.VideoCapture(path)
    try:
        if not cap.isOpened():
            raise IOError(f"cannot open video: {path}")
        if first > 0:
            if os.environ.get("VIDEOWALK_SEQ_DECODE", "") not in ("", "0"):
                for _ in range(first):
                    cap.grab()
            else:
                cap.set(cv2.CAP_PROP_POS_FRAMES, first)
        needed = set(int(i) for i in frame_idxs)  # O(1) tests in the loop
        buf = {}
        for fi in range(first, last + 1):
            ok, frame = cap.read()
            if not ok:
                raise IOError(f"decode failed at frame {fi} of {path}")
            if fi in needed:
                buf[fi] = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        return np.stack([buf[int(i)] for i in frame_idxs])
    finally:
        cap.release()


class UniformClipSampler:
    """Evenly-spaced ``num_clips_per_video`` clips per video, in order
    (torchvision semantics; the reference imports it alongside
    RandomClipSampler at code/train.py:18)."""

    def __init__(self, clip_index: VideoClipIndex, num_clips_per_video: int):
        self.clip_index = clip_index
        self.num_clips_per_video = num_clips_per_video

    def __iter__(self):
        idxs = []
        cum = self.clip_index.cumulative
        for vi in range(len(cum) - 1):
            n = cum[vi + 1] - cum[vi]
            if n <= 0:
                continue
            take = self.num_clips_per_video
            pos = np.linspace(cum[vi], cum[vi + 1] - 1, num=take)
            # torchvision floors the linspace (video_utils sampler), it does
            # not round — fractional midpoints pick the earlier clip
            idxs.extend(int(p) for p in np.floor(pos))
        return iter(idxs)

    def __len__(self):
        nonempty = sum(
            1 for vi in range(len(self.clip_index.cumulative) - 1)
            if self.clip_index.cumulative[vi + 1]
            - self.clip_index.cumulative[vi] > 0)
        return nonempty * self.num_clips_per_video


class RandomClipSampler:
    """At most ``max_clips_per_video`` random clips per video, shuffled
    (torchvision semantics; code/train.py:217-218)."""

    def __init__(self, clip_index: VideoClipIndex, max_clips_per_video: int,
                 seed: int | None = None):
        self.clip_index = clip_index
        self.max_clips_per_video = max_clips_per_video
        self.rng = random.Random(seed)

    def __iter__(self):
        idxs = []
        cum = self.clip_index.cumulative
        for vi in range(len(cum) - 1):
            n = cum[vi + 1] - cum[vi]
            take = min(n, self.max_clips_per_video)
            if take > 0:
                idxs.extend(self.rng.sample(range(cum[vi], cum[vi + 1]), take))
        self.rng.shuffle(idxs)
        return iter(idxs)

    def __len__(self):
        cum = self.clip_index.cumulative
        return sum(min(cum[i + 1] - cum[i], self.max_clips_per_video)
                   for i in range(len(cum) - 1))
