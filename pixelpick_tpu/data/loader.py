"""Threaded prefetching batch loader.

Replaces ``torch.utils.data.DataLoader`` (reference
``utils/utils.py:102-108``): worker threads decode+augment samples while the
device computes, batches are collated into contiguous NumPy arrays ready
for a jitted step. Matches the reference's batching quirks: optional
shuffling per epoch and ``drop_last`` only when the remainder is exactly 1
(``utils/utils.py:107``) — so at most two batch shapes compile per loader.
The drop-last rule applies to TRAIN modes only: the reference shares it
across every loader but always builds val/query at batch size 1
(``eval.py:113``, ``model.py:36-38``) where ``n % 1 == 1`` can never hold,
so no val or pool image is ever dropped there — at TPU batch sizes the
shared rule would silently skip one val image from the metrics (or worse,
leave one pool image forever unscorable by acquisition).

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


def pad_sample_to(sample: dict, hw, pad_label: int) -> dict:
    """Pad a variable-size val/query sample to a bucket shape (bottom/right).

    x is edge-padded (the reference reflect-pads only to a stride multiple,
    ``eval.py:49-60``; bucket pads can exceed the image size, where reflect
    is undefined — the pad region is masked out of every metric anyway:
    labels are padded with the ignore index so the confusion matrix drops
    them (utils/metrics.py:confusion_matrix) and ``excluded`` is padded True
    so acquisition never picks a pad pixel (acquisition.py fill)."""
    h, w = sample["x"].shape[:2]
    ph, pw = hw[0] - h, hw[1] - w
    if ph == 0 and pw == 0:
        return sample
    out = dict(sample)
    out["x"] = np.pad(sample["x"], ((0, ph), (0, pw), (0, 0)), mode="edge")
    if "y" in sample:
        out["y"] = np.pad(sample["y"], ((0, ph), (0, pw)),
                          constant_values=pad_label)
    if "excluded" in sample:
        out["excluded"] = np.pad(sample["excluded"], ((0, ph), (0, pw)),
                                 constant_values=True)
    return out


class Loader:
    """mode: 'train' | 'train_dense' | 'val' | 'query'."""

    def __init__(self, dataset, batch_size: int, mode: str = "train",
                 shuffle: bool = False, n_workers: int = 4, seed: int = 0,
                 human_labels: bool = False, prefetch: int = 2,
                 bucket_stride: int = None, pad_label: int = 255,
                 drop_unit: int = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.mode = mode
        self.shuffle = shuffle
        self.n_workers = max(1, n_workers)
        self.seed = seed
        self.human_labels = human_labels
        self.prefetch = prefetch
        self.bucket_stride = bucket_stride
        self.pad_label = pad_label
        # drop_unit: batch size the reference drop-last rule is evaluated
        # at. Megabatch training (--micro_batch_size M at a larger
        # --batch_size) passes M so the dropped-image set matches the
        # reference's bs-M schedule exactly (remainder-1 AT THE UPDATE
        # size drops the final shuffled image).
        self.drop_unit = drop_unit or batch_size
        self._buckets = None  # lazy: [(bucket_hw, [indices...]), ...]
        self.epoch = 0
        n = len(dataset)
        # utils/utils.py:107, train-only (see module docstring)
        self.drop_last = (mode in ("train", "train_dense")
                          and (n % self.drop_unit) == 1)
        # separate pools: orchestrators must never wait on tasks queued in
        # their own pool (deadlocks when n_workers is small)
        self._pool = ThreadPoolExecutor(max_workers=self.n_workers)
        self._batch_pool = ThreadPoolExecutor(max_workers=max(1, prefetch))

    def close(self) -> None:
        """Release the worker thread pools (idempotent)."""
        self._pool.shutdown(wait=False, cancel_futures=True)
        self._batch_pool.shutdown(wait=False, cancel_futures=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __len__(self) -> int:
        if self.bucket_stride is not None:
            return sum(-(-len(idxs) // self.batch_size)
                       for _, idxs in self._bucket_plan())
        n = len(self.dataset) - (1 if self.drop_last else 0)
        return -(-n // self.batch_size)

    def _bucket_plan(self):
        """Group dataset indices into ≤2 shape buckets (landscape/portrait),
        each padded to its group max rounded up to ``bucket_stride`` — so a
        variable-size val/query sweep compiles ≤2 XLA programs instead of
        one per distinct image shape (SURVEY §7 hard-part 5; the reference
        pays a batch-1 forward per image, ``eval.py:49-60``)."""
        if self._buckets is None:
            s = self.bucket_stride
            n = len(self.dataset)
            hws = [tuple(self.dataset.sample_hw(i, self.mode))
                   for i in range(n)]
            groups = {}
            for i, (h, w) in enumerate(hws):
                groups.setdefault(h >= w, []).append(i)
            buckets = []
            for _, idxs in sorted(groups.items()):
                bh = -(-max(hws[i][0] for i in idxs) // s) * s
                bw = -(-max(hws[i][1] for i in idxs) // s) * s
                buckets.append(((bh, bw), idxs))
            self._buckets = buckets
        return self._buckets

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def batch_index_plan(self, epoch: int) -> List[np.ndarray]:
        """The epoch's batch index sequence — shuffle recipe + drop-last rule
        in ONE place, consumed by ``__iter__`` and by the driver's
        device-pipeline path (``active/driver.py:_epoch_batches``), so the
        host-loader and device-augment input modes provably train on the
        same ordering for the same (seed, epoch)."""
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed * 100003 + epoch).shuffle(order)
        if self.drop_last:
            # remainder-1 at drop_unit granularity: the rule only ever
            # fires for a single trailing image (see __init__), so dropping
            # the last SHUFFLED image is exactly the reference's dropped
            # batch — and stays correct when drop_unit < batch_size
            # (megabatch schedules)
            order = order[:-1]
        return [order[i:i + self.batch_size]
                for i in range(0, len(order), self.batch_size)]

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
        if self.bucket_stride is not None:
            # bucketed val/query: batches carry their dataset indices and
            # per-image true sizes; nothing is dropped
            batches = []
            for hw, idxs in self._bucket_plan():
                for i in range(0, len(idxs), self.batch_size):
                    batches.append((np.asarray(idxs[i:i + self.batch_size]),
                                    hw))

            def make_batch(idxs_hw):
                idxs, hw = idxs_hw
                samples = list(self._pool.map(self._fetch, idxs))
                true_hw = [s["x"].shape[:2] for s in samples]
                padded = [pad_sample_to(s, hw, self.pad_label)
                          for s in samples]
                index = list(idxs)
                # fill partial batches with fully-masked duplicates
                # (index=-1, labels=ignore, excluded=True) so every bucket
                # compiles exactly one batch shape; consumers skip index<0
                while len(padded) < self.batch_size:
                    dup = dict(padded[-1])
                    if "y" in dup:
                        dup["y"] = np.full_like(dup["y"], self.pad_label)
                    if "excluded" in dup:
                        dup["excluded"] = np.ones_like(dup["excluded"])
                    padded.append(dup)
                    true_hw.append((0, 0))
                    index.append(-1)
                batch = collate(padded)
                batch["index"] = np.asarray(index, np.int32)
                batch["hw"] = np.asarray(true_hw, np.int32)
                return batch
        else:
            batches = self.batch_index_plan(self.epoch)

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
