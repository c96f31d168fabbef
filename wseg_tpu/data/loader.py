"""Host input pipeline: shuffling, batching, thread-pool prefetch.

Replaces torch `DataLoader(num_workers=8)` (contrast_train.py:80-86). Image
decode + PIL augmentation release the GIL, so a thread pool keeps the TPU fed
without torch's worker processes; batches are stacked into pinned numpy
arrays ready for `jax.device_put`.
"""

from __future__ import annotations

import random
from concurrent.futures import ThreadPoolExecutor

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 8,
        prefetch: int = 4,
        collate=None,
        seed: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.collate = collate or default_collate
        self.seed = seed
        self._rng = random.Random(seed)
        self._epoch = None

    def set_epoch(self, epoch: int):
        """Epoch-indexed determinism: the shuffle order for epoch e becomes a
        pure function of (seed, e) — a restarted process that calls
        set_epoch(e) sees exactly the order the original run would have
        (the `--resume` equivalence guarantee). Also forwarded to the
        dataset's augmentation rng when it supports it. Never calling this
        keeps the stateful stream behavior."""
        self._epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        order = list(range(len(self.dataset)))
        if self.shuffle:
            rng = (
                random.Random(f"{self.seed}:{self._epoch}")
                if self._epoch is not None else self._rng
            )
            rng.shuffle(order)
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:

            def fetch(idxs):
                return self.collate([self.dataset[i] for i in idxs])

            pending = []
            it = iter(batches)
            for _ in range(self.prefetch):
                b = next(it, None)
                if b is None:
                    break
                pending.append(pool.submit(fetch, b))
            while pending:
                fut = pending.pop(0)
                b = next(it, None)
                if b is not None:
                    pending.append(pool.submit(fetch, b))
                yield fut.result()


def default_collate(samples):
    """Stack tuple elements; numpy arrays get np.stack, everything else a list."""
    out = []
    for col in zip(*samples):
        if isinstance(col[0], np.ndarray):
            out.append(np.stack(col))
        elif isinstance(col[0], (tuple, list)) and col[0] and isinstance(col[0][0], np.ndarray):
            out.append([np.stack(c) for c in zip(*col)])
        else:
            out.append(list(col))
    return tuple(out)
