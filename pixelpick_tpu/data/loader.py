"""Threaded prefetching batch loader.

Replaces ``torch.utils.data.DataLoader`` (reference
``utils/utils.py:102-108``): worker threads decode+augment samples while the
device computes, batches are collated into contiguous NumPy arrays ready
for a jitted step. Matches the reference's batching quirks: optional
shuffling per epoch and ``drop_last`` only when the remainder is exactly 1
(``utils/utils.py:107``) — so at most two batch shapes compile per loader.

Augmentation RNG is per-(epoch, index) (see ``data/augment.py``), so results
are independent of thread scheduling.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List

import numpy as np


def collate(samples: List[dict]) -> Dict[str, np.ndarray]:
    out = {}
    for k in samples[0]:
        out[k] = np.stack([s[k] for s in samples])
    return out


class Loader:
    """mode: 'train' | 'train_dense' | 'val' | 'query'."""

    def __init__(self, dataset, batch_size: int, mode: str = "train",
                 shuffle: bool = False, n_workers: int = 4, seed: int = 0,
                 human_labels: bool = False, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.mode = mode
        self.shuffle = shuffle
        self.n_workers = max(1, n_workers)
        self.seed = seed
        self.human_labels = human_labels
        self.prefetch = prefetch
        self.epoch = 0
        n = len(dataset)
        self.drop_last = (n % batch_size) == 1  # utils/utils.py:107
        # separate pools: orchestrators must never wait on tasks queued in
        # their own pool (deadlocks when n_workers is small)
        self._pool = ThreadPoolExecutor(max_workers=self.n_workers)
        self._batch_pool = ThreadPoolExecutor(max_workers=max(1, prefetch))

    def __len__(self) -> int:
        n = len(self.dataset)
        full, rem = divmod(n, self.batch_size)
        return full + (0 if (self.drop_last or rem == 0) else 1)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _fetch(self, i: int) -> dict:
        if self.mode == "train":
            return self.dataset.train_sample(i, self.epoch,
                                             human_labels=self.human_labels)
        if self.mode == "train_dense":
            return self.dataset.train_sample(i, self.epoch, fully_sup=True)
        if self.mode == "val":
            return self.dataset.val_sample(i)
        if self.mode == "query":
            return self.dataset.query_sample(i, human_labels=self.human_labels)
        raise ValueError(self.mode)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed * 100003 + self.epoch).shuffle(order)
        batches = [order[i:i + self.batch_size]
                   for i in range(0, n, self.batch_size)]
        if batches and len(batches[-1]) != self.batch_size and self.drop_last:
            batches.pop()

        def make_batch(idxs):
            return collate(list(self._pool.map(self._fetch, idxs)))

        # simple pipelined prefetch: keep `prefetch` batches in flight
        futures = []
        b_iter = iter(batches)
        for _ in range(self.prefetch):
            try:
                futures.append(self._batch_pool.submit(make_batch, next(b_iter)))
            except StopIteration:
                break
        while futures:
            batch = futures.pop(0).result()
            try:
                futures.append(self._batch_pool.submit(make_batch, next(b_iter)))
            except StopIteration:
                pass
            yield batch
