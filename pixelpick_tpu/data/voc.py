"""PASCAL VOC 2012 segmentation (reference ``datasets/voc.py``).

Differences from the shared base (mirroring the reference's own VOC class):

- images vary in size; train/query samples resize the longer side to
  ``size_base`` (400), train additionally random-scales and crops to
  ``size_crop`` (320) with milder colour jitter (0.1/0.1/0.1/0.1,
  ``voc.py:176``);
- ``label_queries`` takes raw per-image bool masks rather than the encoded
  dict (``voc.py:108-124``) — kept for compatibility, plus the encoded-dict
  form for the unified driver;
- validation keeps original sizes (the eval loop pads to a stride multiple,
  ``eval.py:49-60``).

Directory layout: standard VOCdevkit, or the 'augmented' train set of
(image, annot) pairs (``voc.py:214-226``).
"""

from __future__ import annotations

import os
import pickle as pkl
from glob import glob
from typing import List

import numpy as np
from PIL import Image

from pixelpick_tpu.data.base import SegDatasetBase, extract_sparse_labels
from pixelpick_tpu.data.augment import photometric_augment, geometric_augment


def compute_base_size(h: int, w: int, size_base: int):
    """Resize so the longer side equals size_base (voc.py:126-133)."""
    if w > h:
        return int(float(h) / w * size_base), size_base
    return size_base, int(float(w) / h * size_base)


def _find_voc_split(dir_dataset: str, val: bool) -> List[str]:
    root = None
    for cand in (os.path.join(dir_dataset, "VOCdevkit", "VOC2012"), dir_dataset):
        if os.path.isdir(os.path.join(cand, "ImageSets", "Segmentation")):
            root = cand
            break
    if root is None:
        raise FileNotFoundError(f"no VOC2012 layout under {dir_dataset}")
    split = "val" if val else "train"
    with open(os.path.join(root, "ImageSets", "Segmentation", f"{split}.txt")) as f:
        names = [l.strip() for l in f if l.strip()]
    imgs = [os.path.join(root, "JPEGImages", f"{n}.jpg") for n in names]
    labs = [os.path.join(root, "SegmentationClass", f"{n}.png") for n in names]
    return imgs, labs


class VOC2012Segmentation(SegDatasetBase):
    dataset_name = "voc"

    def __init__(self, args, val=False, query=False,
                 generate_init_queries: bool = True):
        super().__init__(args, val=val, query=query)
        self.size_base = args.size_base
        self.size_crop = (args.size_crop, args.size_crop)
        self.crop_size = self.size_crop  # train-batch shape (driver init)
        self.stride_total = args.stride_total
        self.jitter = (0.1, 0.1, 0.1, 0.1)  # voc.py:176

        if args.use_augmented_dataset and not val:
            # AugmentedVOC layout: {root}/images, {root}/annot name-matched
            # pairs (reference voc.py:214-226; root default args.py:133)
            root = args.dir_augmented_dataset
            if not os.path.isdir(root):
                raise FileNotFoundError(
                    f"--use_augmented_dataset: no directory at {root} "
                    "(set --dir_augmented_dataset)")
            imgs = sorted(glob(f"{root}/images/*"))
            labs = sorted(glob(f"{root}/annot/*"))
            assert len(imgs) == len(labs) and imgs, \
                f"unpaired augmented dataset under {root}"
            for p_img, p_lab in zip(imgs, labs):  # voc.py:224
                stem = os.path.basename(p_img).split(".")[0]
                assert os.path.basename(p_lab).split(".")[0] == stem, \
                    (p_img, p_lab)
            self.list_inputs, self.list_labels = imgs, labs
        else:
            self.list_inputs, self.list_labels = _find_voc_split(
                args.dir_dataset, val)
        print("# images:", len(self.list_inputs))
        self.cache_images = False  # variable sizes, keep decode-on-demand

        if query:  # voc.py:35-38
            self.geometric_augmentations["random_scale"] = False
            self.geometric_augmentations["crop"] = False
            self.geometric_augmentations["random_hflip"] = False

        n_px = args.n_pixels_by_us
        init_n = args.n_init_pixels if args.n_init_pixels > 0 else n_px
        if n_px != 0 and not val and generate_init_queries:
            # same multi-host primary-publish/wait protocol as
            # base.generate_init_queries (via the SAME shared helpers —
            # keep any protocol change in base.py's helpers, not here);
            # only the generation differs: labels are sampled at the
            # base-resized size and cached as raw masks (voc.py:47-66)
            from pixelpick_tpu.data.base import atomic_publish, \
                wait_for_primary_file
            path_queries = f"{args.dir_dataset}/init_labelled_pixels_{self.seed}.pkl"
            wait_for_primary_file(path_queries)  # multi-host: primary writes
            if os.path.isfile(path_queries):
                with open(path_queries, "rb") as f:
                    self.queries = pkl.load(f)
            else:
                rng = np.random.RandomState(self.seed)
                qs: List[np.ndarray] = []
                for i in range(len(self.list_labels)):
                    label = Image.open(self.list_labels[i])
                    w, h = label.size
                    h, w = compute_base_size(h, w, self.size_base)
                    lab = np.asarray(label.resize((w, h), Image.NEAREST),
                                     dtype=np.int32)
                    cand = np.nonzero(lab.reshape(-1) != 255)[0]
                    k = min(init_n, len(cand))
                    chosen = rng.choice(cand, k, replace=False)
                    q = np.zeros(h * w, bool)
                    q[chosen] = True
                    qs.append(q.reshape(h, w))
                def _write(p, _q=qs):
                    with open(p, "wb") as f:
                        pkl.dump(_q, f)

                atomic_publish(path_queries, _write)
                self.queries = qs
                atomic_publish(f"{self.dir_checkpoints}/0_query/label.pkl",
                               _write)
            self.n_pixels_total = int(sum(int(q.sum()) for q in self.queries))
            print("# labelled pixels used for training:", self.n_pixels_total)

    # voc.py:108-124 — VOC's label_queries takes raw bool masks
    def label_queries(self, queries, nth_query=None) -> int:
        if isinstance(queries, dict):
            from pixelpick_tpu.active import codec
            queries = codec.decode_queries(queries)
        assert len(queries) == len(self.queries)
        previous = self.n_pixels_total
        self.queries = [np.logical_or(q, m) for q, m in zip(queries, self.queries)]
        self.n_pixels_total = int(sum(int(q.sum()) for q in self.queries))
        if isinstance(nth_query, int):
            from pixelpick_tpu.data.base import _is_primary
            if _is_primary():
                d = f"{self.dir_checkpoints}/{nth_query}_query"
                os.makedirs(d, exist_ok=True)
                with open(f"{d}/label.pkl", "wb") as f:
                    pkl.dump(self.queries, f)
        print(f"# labelled pixels is changed from {previous} to "
              f"{self.n_pixels_total} (delta: {self.n_pixels_total - previous})")
        return self.n_pixels_total

    # --------------------------- samples ---------------------------

    variable_size = True  # images differ in size -> bucketed val/query

    def sample_hw(self, i: int, mode: str):
        """True (h, w) a val/query sample will have, without decoding pixels
        (PIL reads only the header) — drives Loader shape bucketing."""
        with Image.open(self.list_inputs[i]) as im:
            w, h = im.size
        if mode == "query":
            return compute_base_size(h, w, self.size_base)
        return h, w

    def _base_resized(self, i: int):
        x = Image.open(self.list_inputs[i]).convert("RGB")
        y = Image.open(self.list_labels[i])
        w, h = x.size
        h, w = compute_base_size(h, w, self.size_base)
        x = x.resize((w, h), Image.BILINEAR)
        y = y.resize((w, h), Image.NEAREST)
        return x, y

    def train_sample(self, i: int, epoch: int, human_labels: bool = False,
                     fully_sup: bool = False) -> dict:
        rng = self.sample_rng(epoch, i)
        x, y = self._base_resized(i)
        queries = None if (fully_sup or human_labels) else self.queries[i]
        labelled = self.list_labelled_queries[i] if human_labels else None
        x, y_np, q_np, l_np = geometric_augment(
            x, y, queries, labelled, rng,
            crop_size=self.size_crop, mean_fill=self.mean_fill,
            ignore_index=self.ignore_index,
            enabled=self.geometric_augmentations)
        if not self.query:
            x = photometric_augment(x, rng, jitter=self.jitter,
                                    enabled=self.photometric_augmentations)
        x_np = np.asarray(x, dtype=np.uint8)
        if fully_sup:
            return {"x": x_np, "y": y_np}
        if human_labels:
            from pixelpick_tpu.data.base import extract_sparse_from_map
            coords, labels, valid = extract_sparse_from_map(
                l_np, self.ignore_index, self.k_max)
        else:
            coords, labels, valid = extract_sparse_labels(
                q_np, y_np, self.ignore_index, self.k_max)
        return {"x": x_np, "coords": coords, "labels": labels, "valid": valid}

    def val_sample(self, i: int) -> dict:
        x = np.asarray(Image.open(self.list_inputs[i]).convert("RGB"), np.uint8)
        y = np.asarray(Image.open(self.list_labels[i]), np.int32)
        return {"x": x, "y": y}

    def query_sample(self, i: int, human_labels: bool = False) -> dict:
        x, y = self._base_resized(i)
        x = np.asarray(x, np.uint8)
        y = np.asarray(y, np.int32)
        if human_labels:
            m = self.list_labelled_queries[i]
            excluded = m != self.ignore_index
            y = np.zeros(excluded.shape, np.int32)
        else:
            excluded = self.queries[i]
        return {"x": x, "y": y, "excluded": excluded}
