"""Host-side data layer: clip indexing, video decode, augmentation,
superpixels, and the dataset classes mirroring the reference's
``code/data/`` surface (Kinetics400, VideoList, SingleVideoDataset,
VOSDataset, JhmdbSet).
"""

from videowalk_tpu.data.superpixels import (
    compute_mask,
    compute_sp_slic,
    compute_sp_FH,
)
from videowalk_tpu.data.clips import VideoClipIndex, RandomClipSampler
from videowalk_tpu.data.kinetics import Kinetics400
from videowalk_tpu.data.image_folder import ImageFolder, is_image_folder
from videowalk_tpu.data.video import VideoList, SingleVideoDataset
from videowalk_tpu.data.loader import DataLoader

__all__ = [
    "compute_mask",
    "compute_sp_slic",
    "compute_sp_FH",
    "VideoClipIndex",
    "RandomClipSampler",
    "Kinetics400",
    "ImageFolder",
    "is_image_folder",
    "VideoList",
    "SingleVideoDataset",
    "DataLoader",
]
