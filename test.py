#!/usr/bin/env python
"""Evaluation entry point (reference ``code/test.py`` CLI parity).

Usage matches the reference, e.g.:
    python test.py --filelist eval/davis_vallist.txt --model-type scratch \
        --resume checkpoints/.../checkpoint.pth --save-path results/ \
        --topk 10 --videoLen 20 --radius 12 --temperature 0.05 --cropSize -1
"""

from videowalk_tpu.cli.test import main
from videowalk_tpu.utils.arguments import test_args

if __name__ == "__main__":
    main(test_args())
