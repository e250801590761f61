"""Threaded prefetching data loader.

Replaces the reference's torch DataLoader (code/train.py:225-232, workers//2
processes, pin_memory) with a thread-pool prefetcher: cv2 decode and the
numpy transforms release the GIL, so threads overlap decode/augment/SLIC with
TPU compute without multiprocessing serialization overhead. Batches are
collated into contiguous numpy arrays ready for a single host->HBM transfer.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Sequence

import numpy as np


def default_collate(items: Sequence):
    """Stack a list of samples into batch arrays (dicts/tuples/arrays)."""
    first = items[0]
    if isinstance(first, dict):
        return {k: default_collate([it[k] for it in items]) for k in first}
    if isinstance(first, (tuple, list)):
        return type(first)(default_collate(list(col)) for col in zip(*items))
    if isinstance(first, np.ndarray):
        return np.stack(items)
    return np.asarray(items)


class DataLoader:
    """Iterate ``dataset[i]`` for i from ``sampler`` in batches, prefetching
    with ``num_workers`` threads."""

    def __init__(self, dataset, batch_size: int, sampler: Iterable | None = None,
                 num_workers: int = 4, collate_fn: Callable = default_collate,
                 drop_last: bool = True, prefetch_batches: int = 2,
                 shard: tuple[int, int] | None = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_workers = max(1, num_workers)
        self.collate_fn = collate_fn
        self.drop_last = drop_last
        self.prefetch_batches = prefetch_batches
        if shard is not None:
            rank, world = shard
            if not (0 <= rank < world):
                raise ValueError(f"shard rank {rank} not in [0, {world})")
        self.shard = shard

    def _indices(self):
        if self.sampler is not None:
            base = list(iter(self.sampler))
        else:
            base = list(range(len(self.dataset)))
        if self.shard is not None:
            # Multi-process data sharding (parallel/multihost.py): every
            # process draws the SAME sampler sequence (shared seed), takes
            # its strided slice, and truncates to the floor-common length so
            # all processes run exactly the same number of steps (required:
            # a straggler with one extra batch would hang the collectives).
            rank, world = self.shard
            base = base[rank::world][:len(base) // world]
        return base

    def __len__(self):
        # len(sampler), never list(iter(sampler)): drawing the sampler here
        # would be O(dataset) per call AND advance its RNG, so an epoch's
        # clip selection would depend on how often __len__ was called (the
        # train loop calls it every step).
        n = (len(self.sampler) if self.sampler is not None
             else len(self.dataset))
        if self.shard is not None:
            n = n // self.shard[1]
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator:
        indices = self._indices()
        batches = [indices[i:i + self.batch_size]
                   for i in range(0, len(indices), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        def _put(item) -> bool:
            """Bounded put that observes early consumer exit: a consumer that
            stops iterating sets ``stop``, and a producer blocked on a full
            queue must see it rather than leak as a blocked daemon thread."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_idx in batches:
                        if stop.is_set():
                            return
                        items = list(pool.map(self.dataset.__getitem__,
                                              batch_idx))
                        if not _put(self.collate_fn(items)):
                            return
            except BaseException as e:
                # Worker failures must surface in the consumer, not strand it
                # on a queue that will never be fed (the pre-fix behavior).
                _put(e)
                return
            _put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    break
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
            # drain so a producer blocked in _put can observe stop, then
            # join: without the join a new epoch's producer pool would
            # overlap this one's still-draining decode threads (2x CPU-heavy
            # workers transiently — thrashing on small hosts)
            try:
                while True:
                    out_q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=30.0)
