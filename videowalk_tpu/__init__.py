"""videowalk_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
self-supervised video representation learning via Contrastive Random Walks
(CRW) on space-time graphs.

This is the importable package for the framework referred to in the project
docs as ``sapienza-video-contrastive_tpu`` (the reference repo name contains a
hyphen, which is not a valid Python identifier).

Capabilities (parity surface with the PyTorch reference
``paolomandica/sapienza-video-contrastive``; see SURVEY.md):

- Palindrome-clip cycle-consistency (CRW) training over patch-grid or
  SLIC-superpixel graph nodes (reference ``code/model.py``).
- Superpixel dilation, randomized segment counts, probabilistic
  patch/superpixel mixing (reference ``code/data/superpixels.py``,
  ``code/utils/arguments.py``).
- Teacher-student distillation variant (reference ``code/teacherstudent.py``).
- Zero-shot evaluation via k-NN label propagation on DAVIS-2017 / JHMDB / VIP
  (reference ``code/test.py``, ``code/eval/``).

Subpackages
-----------
core      pure-functional loss math (affinity, zero-softmax, palindrome walk)
models    flax encoders (ResNet-18/50) + CRW / teacher-student models
ops       Pallas TPU kernels and fused ops for the hot paths
parallel  mesh construction, shardings, pjit train/eval steps
data      host-side input pipeline (clip index, decode, augs, superpixels)
utils     meters, checkpointing (.pth-compatible), arguments/CLI
eval      label-propagation evaluator post-processing + metric scripts
cli       train/test entry points with the reference's flag surface
"""

__version__ = "0.1.0"
