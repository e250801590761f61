"""Shared unique-frame decode for the eval datasets.

Eval videos prepend ``videoLen`` copies of frame 0 (reference
code/data/vos.py:148-156, jhmdb.py equivalent), so repeated paths should be
decoded once. With ``workers > 1`` the unique frames decode on a thread pool
— cv2/PIL release the GIL in imread/resize/cvtColor, which is where the eval
host time goes on multi-core machines. Results are byte-identical to serial
decode (pinned by the dataset tests).
"""

from __future__ import annotations

from typing import Callable, Sequence


def decode_unique(paths: Sequence, fn: Callable, workers: int) -> dict:
    """Decode each unique path once with ``fn``; returns {path: fn(path)}.

    Order-stable (first occurrence order), exceptions from ``fn`` propagate
    at the call site in both the serial and threaded paths.
    """
    uniq = list(dict.fromkeys(paths))
    if workers > 1 and len(uniq) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as pool:
            return dict(zip(uniq, pool.map(fn, uniq)))
    return {p: fn(p) for p in uniq}
