"""DAVIS/PASCAL-VOC 256-color palette.

The reference ships the table as a literal (code/eval/palette.py); it is the
standard VOC colormap, generated here procedurally (bit-reversal rule).
"""

import numpy as np


def voc_colormap(n: int = 256) -> np.ndarray:
    """(n, 3) uint8 PASCAL-VOC palette."""
    cmap = np.zeros((n, 3), np.uint8)
    for i in range(n):
        r = g = b = 0
        cid = i
        for j in range(8):
            r |= ((cid >> 0) & 1) << (7 - j)
            g |= ((cid >> 1) & 1) << (7 - j)
            b |= ((cid >> 2) & 1) << (7 - j)
            cid >>= 3
        cmap[i] = (r, g, b)
    return cmap


tensor = voc_colormap().astype(np.float64)  # name parity with reference
