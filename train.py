#!/usr/bin/env python
"""Train entry point (reference ``code/train.py`` CLI parity).

Usage matches the reference, e.g.:
    python train.py --data-path /data/kinetics/ --frame-aug grid \
        --dropout 0.1 --clip-len 4 --temp 0.05 --model-type scratch \
        --batch-size 6 --lr 0.0003 --prob 0.7 --sp-method slic --num-sp 36
"""

from videowalk_tpu.cli.train import main
from videowalk_tpu.utils.arguments import train_args

if __name__ == "__main__":
    main(train_args())
