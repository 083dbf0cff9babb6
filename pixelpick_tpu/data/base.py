"""Dataset base: query-mask state, the GT oracle, and sample production.

Reference semantics (``datasets/base_dataset.py``):

- ``label_queries``: decode a round's encoded picks, OR-merge into the
  per-image boolean query masks, dump ``{nth}_query/queries.pkl``
  (``base_dataset.py:24-46``) — the AL loop's real checkpoint state;
- ``update_labelled_queries``: install human-labelled per-pixel maps
  (``base_dataset.py:143-149``);
- train samples co-augment (x, y, queries, labelled) and normalise; val and
  query samples skip augmentation (``base_dataset.py:151-189``).

TPU-native differences:

- images/labels are decoded once and cached in RAM as uint8/int32 arrays
  (CamVid train = ~190 MB; quarter-res Cityscapes ~1.2 GB);
- train samples return *sparse coordinates* — (K, 2) int32 pixel coords +
  labels + valid mask extracted after augmentation — feeding the sparse-
  label train step instead of densified labels;
- samples stay uint8; normalisation happens on device
  (``engine/trainer.py:normalize_images``).
"""

from __future__ import annotations

import os
import pickle as pkl
import random
import time
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from pixelpick_tpu.parallel.distributed import is_primary as _is_primary


def wait_for_primary_file(path: str, timeout: float = 1800.0) -> None:
    """Multi-host cache coordination: block a NON-primary process until the
    primary has atomically published ``path`` (no-op on the primary /
    single-process). The generous timeout covers first-run generation that
    reads every label image (VOC ~10k files). The path must live on a
    filesystem shared by all processes."""
    if _is_primary():
        return
    deadline = time.time() + timeout
    while not os.path.isfile(path):
        if time.time() > deadline:
            raise TimeoutError(
                f"non-primary process waited {timeout:.0f}s for the primary "
                f"to publish {path}")
        time.sleep(0.2)


def atomic_publish(path: str, write_fn) -> None:
    """Write via ``write_fn(tmp_path)`` then atomically rename into place,
    so concurrent readers never observe a torn file."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    write_fn(tmp)
    os.replace(tmp, path)

from pixelpick_tpu.active import codec

# Sparse-extraction overflow counters (labelled pixels dropped because a
# crop contained more than k_max of them). The reference's dense path never
# drops a labelled pixel (model.py:108-116), so any overflow is a parity
# bug — k_max carries scale-aware headroom to make this unreachable, and
# tests assert the counters stay zero. Two units, never mixed:
# COUNT = number of overflow EVENTS (one per overflowing crop / one per
# epoch on the device-augment path); PIXELS = total labelled pixels dropped.
SPARSE_OVERFLOW_COUNT = 0
SPARSE_OVERFLOW_PIXELS = 0


def extract_sparse_labels(queries: np.ndarray, y: np.ndarray,
                          ignore_index: int, k_max: int):
    """Post-augmentation sparse extraction: labelled pixel coords + labels.

    Query pixels whose label is void are kept but marked invalid — exactly
    CE ``ignore_index`` semantics on the densified path (model.py:108-116).
    """
    ys, xs = np.nonzero(queries)
    labels = y[ys, xs].astype(np.int32)
    if len(ys) > k_max:
        global SPARSE_OVERFLOW_COUNT, SPARSE_OVERFLOW_PIXELS
        SPARSE_OVERFLOW_COUNT += 1
        SPARSE_OVERFLOW_PIXELS += len(ys) - k_max
        import warnings
        warnings.warn(
            f"sparse-label overflow: {len(ys)} labelled pixels in crop but "
            f"k_max={k_max}; {len(ys) - k_max} dropped. Raise the k_max "
            "headroom (data/base.py) — the reference never drops labels.")
    n = min(len(ys), k_max)
    coords = np.zeros((k_max, 2), np.int32)
    out_labels = np.zeros((k_max,), np.int32)
    valid = np.zeros((k_max,), bool)
    coords[:n, 0] = ys[:n]
    coords[:n, 1] = xs[:n]
    out_labels[:n] = labels[:n]
    valid[:n] = labels[:n] != ignore_index
    return coords, out_labels, valid


def extract_sparse_from_map(labelled_map: np.ndarray, ignore_index: int,
                            k_max: int):
    """Human-label mode: coords+labels from a merged int label map
    (train.py:44-45)."""
    ys, xs = np.nonzero(labelled_map != ignore_index)
    if len(ys) > k_max:
        global SPARSE_OVERFLOW_COUNT, SPARSE_OVERFLOW_PIXELS
        SPARSE_OVERFLOW_COUNT += 1
        SPARSE_OVERFLOW_PIXELS += len(ys) - k_max
        import warnings
        warnings.warn(
            f"sparse-label overflow (human labels): {len(ys)} labelled "
            f"pixels but k_max={k_max}; {len(ys) - k_max} dropped.")
    n = min(len(ys), k_max)
    coords = np.zeros((k_max, 2), np.int32)
    out_labels = np.zeros((k_max,), np.int32)
    valid = np.zeros((k_max,), bool)
    coords[:n, 0] = ys[:n]
    coords[:n, 1] = xs[:n]
    out_labels[:n] = labelled_map[ys[:n], xs[:n]].astype(np.int32)
    valid[:n] = True
    return coords, out_labels, valid


class SegDatasetBase:
    dataset_name: str = "base"

    def __init__(self, args, val: bool = False, query: bool = False):
        self.args = args
        self.val = val
        self.query = query
        self.seed = args.seed
        self.ignore_index = args.ignore_index
        self.n_classes = args.n_classes
        self.mean = list(args.mean)
        self.std = list(args.std)
        self.dir_checkpoints = args.dir_checkpoints
        self.geometric_augmentations = dict(args.augmentations["geometric"])
        self.photometric_augmentations = dict(args.augmentations["photometric"])
        self.mean_fill = tuple((np.array(self.mean) * 255.0).astype(np.uint8).tolist())
        self.jitter = (0.8, 0.8, 0.8, 0.2)  # base_dataset.py:131

        self.list_inputs: List[str] = []
        self.list_labels: List[str] = []
        self.queries: Optional[List[np.ndarray]] = None
        self.list_labelled_queries: Optional[List[np.ndarray]] = None
        self.n_pixels_total: int = -1
        self.crop_size: Tuple[int, int] = (0, 0)
        self._x_cache: dict = {}
        self._y_cache: dict = {}
        self.cache_images = True
        # Sparse coordinate budget per image (see engine/trainer.py).
        # Headroom: random scale up to 2.0x with nearest-resized query masks
        # duplicates each labelled pixel up to ceil(2.0)^2 = 4x, and in the
        # worst case every duplicate lands inside the crop — so 4x the
        # nominal budget guarantees extract_sparse_labels never truncates
        # (the reference's dense path never drops a label, model.py:108-116).
        base_k = int(max(args.max_budget + max(args.n_init_pixels, 0),
                         args.n_pixels_by_us, 1))
        headroom = 4 if self.geometric_augmentations.get("random_scale") else 1
        self.k_max = base_k * headroom

    # ----------------------------- state -----------------------------

    def label_queries(self, dict_queries: Dict[str, dict], nth_query=None) -> int:
        assert len(dict_queries) == len(self.queries), \
            f"{len(dict_queries)} != {len(self.queries)}"
        new_masks = codec.decode_queries(dict_queries)
        previous = self.n_pixels_total
        self.queries = [np.logical_or(p, n) for p, n in zip(self.queries, new_masks)]
        self.n_pixels_total = int(sum(int(q.sum()) for q in self.queries))
        print(f"# labelled pixels is changed from {previous} to "
              f"{self.n_pixels_total} (delta: {self.n_pixels_total - previous})")
        if isinstance(nth_query, int) and _is_primary():
            d = f"{self.dir_checkpoints}/{nth_query}_query"
            os.makedirs(d, exist_ok=True)
            with open(f"{d}/queries.pkl", "wb") as f:
                pkl.dump(dict_queries, f)
        return self.n_pixels_total

    def update_labelled_queries(self, labelled_queries: List[np.ndarray]) -> None:
        self.list_labelled_queries = labelled_queries

    def set_human_inputs(self, inputs: List[str],
                         labelled_maps: List[np.ndarray]) -> None:
        """Re-wire the dataset onto the merged human-labelled inputs
        (reference ``train.py:204-236``) — constructor-level: ALModel calls
        this BEFORE building loaders, so batch plans/drop-last are computed
        from the merged length, and the GT-side lists can never be read
        positionally misaligned (human mode consumes only the labelled
        maps; ``train_sample`` builds a void y without touching label
        files, so a train split with fewer/no label files is fine)."""
        assert len(inputs) == len(labelled_maps), \
            f"{len(inputs)} inputs != {len(labelled_maps)} labelled maps"
        for p, m in zip(inputs, labelled_maps):
            assert os.path.exists(p), p
            assert m.ndim == 2, (p, m.shape)
        self.list_inputs = list(inputs)
        # GT labels are not consumed in human mode — clear the (now
        # positionally meaningless) label list so any stray _load_y is a
        # loud failure instead of a silent wrong-file read
        self.list_labels = []
        if hasattr(self, "has_labels"):
            self.has_labels = False
        self.queries = None
        self._x_cache.clear()
        self._y_cache.clear()
        self.update_labelled_queries(list(labelled_maps))

    def generate_init_queries(self, n_pixels_per_img: int,
                              path_queries: str,
                              void_filter: bool = True) -> None:
        """Seeded random non-void initial picks, cached (camvid.py:50-96).
        ``void_filter=False`` samples uniformly over ALL pixels — the
        custom-dataset semantics (reference custom_dataset.py:66-79, whose
        train split may have no labels at all).

        Multi-host: the primary process generates and atomically publishes
        the cache file; non-primary processes wait for it and read — so
        every process consumes byte-identical initial picks even when the
        pre-existing cache differs from fresh seeded generation (resumed or
        human-labelled layouts).
        """
        wait_for_primary_file(path_queries)
        if os.path.isfile(path_queries):
            with open(path_queries, "rb") as f:
                self.queries = codec.decode_queries(pkl.load(f))
        else:
            dict_queries: Dict[str, dict] = {}
            rng = np.random.RandomState(self.seed)
            for i in range(len(self.list_inputs)):
                label = self._load_y(i)
                h, w = label.shape
                if void_filter:
                    cand = np.nonzero(label.reshape(-1) != self.ignore_index)[0]
                else:
                    cand = np.arange(h * w)
                chosen = rng.choice(cand, min(n_pixels_per_img, len(cand)),
                                    replace=False)
                q = np.zeros(h * w, bool)
                q[chosen] = True
                dict_queries.update(codec.encode_query(
                    self.list_inputs[i], (h, w), q.reshape(h, w)))
            def _write(p, _q=dict_queries):
                with open(p, "wb") as f:
                    pkl.dump(_q, f)

            atomic_publish(path_queries, _write)
            self.queries = codec.decode_queries(dict_queries)
        self.n_pixels_total = int(sum(int(q.sum()) for q in self.queries))
        print("total number of labelled pixels selected as queries:",
              self.n_pixels_total)

    # ----------------------------- IO -----------------------------

    def _load_x(self, i: int) -> np.ndarray:
        if i not in self._x_cache:
            arr = np.asarray(Image.open(self.list_inputs[i]).convert("RGB"),
                             dtype=np.uint8)
            if not self.cache_images:
                return arr
            self._x_cache[i] = arr
        return self._x_cache[i]

    def _load_y(self, i: int) -> np.ndarray:
        if i not in self._y_cache:
            arr = np.asarray(Image.open(self.list_labels[i]), dtype=np.int32)
            if not self.cache_images:
                return arr
            self._y_cache[i] = arr
        return self._y_cache[i]

    def __len__(self):
        return len(self.list_inputs)

    # ----------------------------- samples -----------------------------

    def sample_rng(self, epoch: int, index: int) -> random.Random:
        return random.Random(
            (int(self.seed) * 1_000_003 + int(epoch)) * 1_000_003 + int(index))

    def train_sample(self, i: int, epoch: int, human_labels: bool = False,
                     fully_sup: bool = False) -> dict:
        from pixelpick_tpu.data.augment import geometric_augment, photometric_augment

        rng = self.sample_rng(epoch, i)
        x_arr = self._load_x(i)
        x = Image.fromarray(x_arr)
        if human_labels:
            # human mode trains on the merged labelled maps only
            # (train.py:44-45) — never read a GT label file (the label list
            # may be empty or shorter than the merged inputs); the augment
            # pipeline still needs a y to co-transform, so feed all-void
            y_arr = np.full(x_arr.shape[:2], self.ignore_index, np.int32)
        else:
            y_arr = self._load_y(i).astype(np.int32)
        y = Image.fromarray(y_arr, mode="I")
        queries = None if (fully_sup or human_labels) else self.queries[i]
        labelled = self.list_labelled_queries[i] if human_labels else None

        x, y_np, q_np, l_np = geometric_augment(
            x, y, queries, labelled, rng,
            crop_size=self.crop_size, mean_fill=self.mean_fill,
            ignore_index=self.ignore_index,
            enabled=self.geometric_augmentations)
        x = photometric_augment(x, rng, jitter=self.jitter,
                                enabled=self.photometric_augmentations)
        x_np = np.asarray(x, dtype=np.uint8)

        if fully_sup:
            return {"x": x_np, "y": y_np}
        if human_labels:
            coords, labels, valid = extract_sparse_from_map(
                l_np, self.ignore_index, self.k_max)
        else:
            coords, labels, valid = extract_sparse_labels(
                q_np, y_np, self.ignore_index, self.k_max)
        return {"x": x_np, "coords": coords, "labels": labels, "valid": valid}

    def val_sample(self, i: int) -> dict:
        return {"x": self._load_x(i), "y": self._load_y(i)}

    def query_sample(self, i: int, human_labels: bool = False) -> dict:
        """Pool-scoring sample. ``excluded`` marks already-labelled pixels
        (query.py:194-201); void exclusion happens on device from y."""
        x = self._load_x(i)
        if human_labels:
            m = self.list_labelled_queries[i]
            excluded = m != self.ignore_index
            y = np.zeros(excluded.shape, np.int32)  # no void info available
        else:
            excluded = self.queries[i]
            y = self._load_y(i)
        return {"x": x, "y": y.astype(np.int32), "excluded": excluded}
