"""Cityscapes with one-time downsample + 33->19 label remap cache
(reference ``datasets/cityscapes.py``).

The reference remaps labels with an O(H*W) interpreted Python loop
(``cityscapes.py:176-180``); here it is a vectorised 256-entry LUT.
"""

from __future__ import annotations

import os
from glob import glob
from typing import List

import numpy as np
from PIL import Image

from pixelpick_tpu.data.base import SegDatasetBase

IGNORE = 19
# cityscapes labelIds -> 19 train ids (cityscapes.py:137-175)
_CLASS_MAP = {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 22: 9,
    23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16, 32: 17, 33: 18,
}


def classes_to_labels_lut() -> np.ndarray:
    lut = np.full(256, IGNORE, dtype=np.uint8)
    for k, v in _CLASS_MAP.items():
        lut[k] = v
    return lut


def make_downsampled_cityscapes(dir_cityscapes: str, downsample: int = 4,
                                val: bool = False) -> None:
    """One-time cache: bilinear-downsample images, nearest labels + remap
    (cityscapes.py:106-134). Output dir: ``{dir}_d{downsample}``.

    Unlike the reference, target sizes derive from the actual image (the
    reference hardcodes 1024x2048), destination paths via relpath (the
    reference's substring replace corrupts paths whose parents contain the
    dataset dir name), and the build is RESUMABLE: pairs whose outputs both
    exist are skipped, so a build killed mid-way completes on the next run
    instead of leaving a silently truncated cache behind.
    """
    src_root = dir_cityscapes.rstrip("/")
    dst_root = f"{src_root}_d{downsample}"
    mode = "val" if val else "train"
    lut = classes_to_labels_lut()
    xs = sorted(glob(f"{src_root}/leftImg8bit/{mode}/**/*.png"))
    ys = sorted(glob(f"{src_root}/gtFine/{mode}/**/*_labelIds.png"))
    for px, py in zip(xs, ys):
        dst_x = os.path.join(dst_root, os.path.relpath(os.path.dirname(px), src_root))
        dst_y = os.path.join(dst_root, os.path.relpath(os.path.dirname(py), src_root))
        out_x = os.path.join(dst_x, os.path.basename(px))
        out_y = os.path.join(dst_y, os.path.basename(py))
        if os.path.isfile(out_x) and os.path.isfile(out_y):
            continue
        os.makedirs(dst_x, exist_ok=True)
        os.makedirs(dst_y, exist_ok=True)
        img = Image.open(px)
        w, h = img.size[0] // downsample, img.size[1] // downsample
        x = img.resize((w, h), Image.BILINEAR)
        y = np.asarray(Image.open(py).resize((w, h), Image.NEAREST))
        y = lut[y]
        x.save(out_x)
        Image.fromarray(y).save(out_y)


class CityscapesDataset(SegDatasetBase):
    dataset_name = "cityscapes"

    def _write_npy(self, path: str) -> None:
        # np.save appends '.npy' to bare paths, which would break the
        # atomic_publish tmp-then-rename — write through a file object
        with open(path, "wb") as f:
            np.save(f, np.stack(self.queries))

    def __init__(self, args, val=False, query=False,
                 generate_init_queries: bool = True):
        super().__init__(args, val=val, query=query)
        ds = args.downsample
        # the reference always evaluates at half resolution
        # (cityscapes.py:25-28) — so the VAL instance's cache factor is 2
        # regardless of --downsample (the reference builds only _d{ds} and
        # then crashes reading _d2 on a fresh quarter-res setup; here each
        # instance builds the cache IT reads)
        factor = ds if (ds > 1 and not val) else 2
        dir_dataset = f"{args.dir_dataset}_d{factor}"
        # multi-host: only the primary builds the downsample cache; a "done"
        # sentinel gates readers so a lagging process can never glob a
        # half-built directory (the dir appears long before it's complete).
        # The build is resumable (existing pairs are skipped), so running it
        # whenever the sentinel is absent completes interrupted builds —
        # including pre-sentinel dirs and caches the reference code left
        # half-written — instead of blessing them as done.
        from pixelpick_tpu.data.base import _is_primary, wait_for_primary_file
        sentinel = f"{dir_dataset}/.downsample_complete"
        if _is_primary():
            if not os.path.isfile(sentinel):
                print(f"Downsampling Cityscapes images (x1/{factor})...")
                make_downsampled_cityscapes(args.dir_dataset,
                                            downsample=factor, val=False)
                make_downsampled_cityscapes(args.dir_dataset,
                                            downsample=factor, val=True)
                with open(sentinel, "w") as f:
                    f.write("ok\n")
        else:
            wait_for_primary_file(sentinel, timeout=7200.0)
        mode = "val" if val else "train"
        self.list_inputs = sorted(glob(f"{dir_dataset}/leftImg8bit/{mode}/**/*.png"))
        self.list_labels = sorted(glob(f"{dir_dataset}/gtFine/{mode}/**/*_labelIds.png"))
        assert len(self.list_inputs) == len(self.list_labels) and self.list_inputs
        for px, py in zip(self.list_inputs, self.list_labels):
            # positional pairing over two sorted globs: verify the stems
            # (name minus the leftImg8bit/gtFine_labelIds suffix)
            # correspond so one stray file can't shift every later
            # (image, label) pair
            sx = os.path.basename(px).replace("_leftImg8bit.png", "")
            sy = os.path.basename(py).replace("_gtFine_labelIds.png", "")
            assert sx == sy, f"image/label mismatch: {px} vs {py}"

        self.crop_size = {2: (512, 1024), 4: (256, 512)}[ds]
        # quarter-res train set fits in RAM; half-res val is larger
        self.cache_images = ds >= 4 or val

        if args.n_pixels_by_us != 0 and not val and generate_init_queries:
            # reference caches the initial picks as one stacked bool array
            # (cityscapes.py:66-96); we reuse the same pkl codec for
            # uniformity and also honour an existing .npy cache
            from pixelpick_tpu.data.base import _is_primary, atomic_publish
            npy = f"{dir_dataset}/init_labelled_pixels_d{ds}_{self.seed}.npy"
            if os.path.isfile(npy):
                stacked = np.load(npy)
                self.queries = [stacked[i] for i in range(stacked.shape[0])]
                self.n_pixels_total = int(stacked.sum())
            else:
                # multi-host: generate_init_queries itself makes non-primary
                # processes wait for the primary's queries.pkl (base.py)
                self.generate_init_queries(
                    args.n_pixels_by_us,
                    f"{self.dir_checkpoints}/0_query/queries.pkl")
                if _is_primary():
                    atomic_publish(npy, self._write_npy)
            if _is_primary():
                atomic_publish(f"{self.dir_checkpoints}/0_query/label.npy",
                               self._write_npy)
