"""TPU-native ops: device superpixels, fused kernels.

The reference's superpixel segmentation runs per-frame skimage SLIC inside
CPU DataLoader workers — its stated bottleneck (reference README.md:12,30;
code/data/superpixels.py). Here segmentation is a batched on-device op
(`slic` below: distance argmin + one-hot-matmul center updates, both
MXU-shaped), plus Pallas kernels for the hot loss paths.
"""

from videowalk_tpu.ops.slic_device import rgb_to_lab, slic

__all__ = ["rgb_to_lab", "slic"]
