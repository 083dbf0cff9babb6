"""Segmentation metrics.

Semantics match the reference confusion-matrix engine
(``/root/reference/utils/metrics.py:162-207``): pixels whose true label is
outside ``[0, n_classes)`` are excluded, mIoU is the nanmean of per-class
``diag / (rowsum + colsum - diag)``.

TPU-native difference: the per-batch histogram is computed **on device**
(one ``jnp.bincount`` over ``n_classes**2 + 1`` bins inside the jitted step)
and accumulated into a device-resident matrix, instead of the reference's
per-iteration ``.cpu().numpy()`` sync (``model.py:125``). Final score math
runs on host NumPy, bit-identical to the reference formulas.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def confusion_matrix(label_true: jnp.ndarray, label_pred: jnp.ndarray,
                     n_classes: int) -> jnp.ndarray:
    """Device-side confusion matrix, jit/vmap-friendly.

    Invalid true labels (< 0 or >= n_classes, e.g. the ignore index) are
    routed to an overflow bin and dropped, reproducing ``_fast_hist``
    (reference ``utils/metrics.py:167-173``).
    """
    lt = label_true.reshape(-1).astype(jnp.int32)
    lp = label_pred.reshape(-1).astype(jnp.int32)
    valid = (lt >= 0) & (lt < n_classes)
    idx = jnp.where(valid, lt * n_classes + lp, n_classes * n_classes)
    hist = jnp.bincount(idx, length=n_classes * n_classes + 1)
    return hist[:-1].reshape(n_classes, n_classes)


def scores_from_confusion(hist: np.ndarray):
    """Host-side score finalisation (reference ``utils/metrics.py:179-204``)."""
    hist = np.asarray(hist, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        acc = np.diag(hist).sum() / hist.sum()
        acc_cls = np.nanmean(np.diag(hist) / hist.sum(axis=1))
        iu = np.diag(hist) / (hist.sum(axis=1) + hist.sum(axis=0) - np.diag(hist))
        mean_iu = np.nanmean(iu)
        freq = hist.sum(axis=1) / hist.sum()
        fwavacc = (freq[freq > 0] * iu[freq > 0]).sum()
    cls_iu = dict(zip(range(hist.shape[0]), iu))
    return (
        {"Pixel Acc": acc, "Mean Acc": acc_cls, "FreqW Acc": fwavacc,
         "Mean IoU": mean_iu},
        cls_iu,
    )


class RunningScore:
    """Accumulating segmentation scorer with the reference's public surface.

    ``update`` accepts either numpy or jax arrays; jax arrays are histogrammed
    on device and only the tiny ``(n, n)`` matrix crosses to host lazily.
    Jitted steps should instead call :func:`confusion_matrix` inside the step
    and feed the result to :meth:`merge`.
    """

    def __init__(self, n_classes: int):
        self.n_classes = n_classes
        self._host = np.zeros((n_classes, n_classes), dtype=np.float64)
        self._device = None  # lazily accumulated jnp matrix

    def merge(self, hist) -> None:
        """Accumulate a precomputed (n, n) confusion matrix (device or host)."""
        if isinstance(hist, np.ndarray):
            self._host += hist
        else:
            self._device = hist if self._device is None else self._device + hist

    def update(self, label_trues, label_preds) -> None:
        if isinstance(label_trues, np.ndarray) or isinstance(label_trues, list):
            lt = np.asarray(label_trues).reshape(-1)
            lp = np.asarray(label_preds).reshape(-1)
            mask = (lt >= 0) & (lt < self.n_classes)
            hist = np.bincount(
                self.n_classes * lt[mask].astype(int) + lp[mask].astype(int),
                minlength=self.n_classes ** 2,
            ).reshape(self.n_classes, self.n_classes)
            self._host += hist
        else:
            self.merge(confusion_matrix(label_trues, label_preds, self.n_classes))

    @property
    def confusion(self) -> np.ndarray:
        total = self._host
        if self._device is not None:
            total = total + np.asarray(self._device)
        return total

    def get_scores(self):
        return scores_from_confusion(self.confusion)

    def reset(self) -> None:
        self._host = np.zeros((self.n_classes, self.n_classes), dtype=np.float64)
        self._device = None


class AverageMeter:
    """Running average (reference ``utils/metrics.py:85-126``)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0.0
        self.avg = 0.0

    def update(self, val, weight=1):
        self.val = val
        self.sum += val * weight
        self.count += weight
        self.avg = self.sum / self.count

    @property
    def average(self):
        return np.round(self.avg, 5)


def compute_spatial_coverage_per_image(indices) -> float:
    """Mean half-sum of pairwise distances between picked pixels
    (reference ``utils/metrics.py:7-16``)."""
    y, x = np.asarray(indices[0], np.float64), np.asarray(indices[1], np.float64)
    n = len(y)
    if n < 2:
        return float("nan")
    dy = y[:, None] - y[None, :]
    dx = x[:, None] - x[None, :]
    dist = np.sqrt(dy * dy + dx * dx)
    off = ~np.eye(n, dtype=bool)
    return float(dist[off].sum() / 2)


def compute_spatial_coverage(masks) -> float:
    """nanmean over images (reference ``utils/metrics.py:19-23``)."""
    return float(np.nanmean([
        compute_spatial_coverage_per_image(np.where(m)) for m in masks
    ]))


def eval_metrics(prediction, target, num_classes, ignore_index):
    """Per-batch (correct, labeled, inter, union) arrays (reference
    ``utils/metrics.py:129-159``), NumPy-only."""
    pred = np.asarray(prediction).astype(np.int64) + 1
    tgt = np.asarray(target).astype(np.int64).copy()
    tgt[tgt == ignore_index] = -1
    tgt = tgt + 1
    labeled = (tgt > 0).sum()
    correct = ((pred == tgt) & (tgt > 0)).sum()
    pred_m = pred * (tgt > 0)
    inter_vals = pred_m * (pred_m == tgt)
    bins = np.arange(1, num_classes + 2)
    area_inter = np.histogram(inter_vals[inter_vals > 0], bins=bins)[0]
    area_pred = np.histogram(pred_m[pred_m > 0], bins=bins)[0]
    area_lab = np.histogram(tgt[tgt > 0], bins=bins)[0]
    area_union = area_pred + area_lab - area_inter
    return [np.round(correct, 5), np.round(labeled, 5),
            np.round(area_inter, 5), np.round(area_union, 5)]
