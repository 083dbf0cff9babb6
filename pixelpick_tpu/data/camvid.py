"""CamVid: 367 train / 233 test, 11 classes, 360x480
(reference ``datasets/camvid.py``)."""

from __future__ import annotations

import os
from glob import glob

from pixelpick_tpu.data.base import SegDatasetBase


class CamVidDataset(SegDatasetBase):
    dataset_name = "camvid"

    def __init__(self, args, val=False, query=False,
                 generate_init_queries: bool = True):
        super().__init__(args, val=val, query=query)
        assert os.path.isdir(args.dir_dataset), f"{args.dir_dataset} does not exist."
        mode = "test" if val else "train"
        self.list_inputs = sorted(glob(f"{args.dir_dataset}/{mode}/*.png"))
        self.list_labels = sorted(glob(f"{args.dir_dataset}/{mode}annot/*.png"))
        assert len(self.list_inputs) > 0
        if mode != "train":
            assert len(self.list_inputs) == len(self.list_labels)
        if self.list_labels:
            # pairing is positional (two independent sorted globs): one
            # missing/extra annot file would silently shift every later
            # (image, label) pair — verify the filenames correspond
            assert len(self.list_inputs) == len(self.list_labels), (
                f"{len(self.list_inputs)} images vs "
                f"{len(self.list_labels)} label files under "
                f"{args.dir_dataset}/{mode}[annot]")
            for px, py in zip(self.list_inputs, self.list_labels):
                assert os.path.basename(px) == os.path.basename(py), \
                    f"image/label mismatch: {px} vs {py}"
        self.crop_size = (360, 480)
        if args.n_pixels_by_us != 0 and not val and generate_init_queries:
            self.generate_init_queries(
                args.n_pixels_by_us,
                f"{self.dir_checkpoints}/0_query/queries.pkl")
