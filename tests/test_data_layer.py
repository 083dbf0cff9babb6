"""Data-layer invariants: co-transforming augmentation, sparse extraction,
loader batching semantics, Cityscapes LUT remap."""

import numpy as np
import random
from PIL import Image

from pixelpick_tpu.data.augment import geometric_augment
from pixelpick_tpu.data.base import extract_sparse_labels, extract_sparse_from_map
from pixelpick_tpu.data.cityscapes import classes_to_labels_lut, IGNORE


def test_geometric_augment_cotransforms_queries_and_labels():
    """A queried pixel must carry its label through scale/pad/crop/flip:
    after augmentation, y at every query location equals the original label
    value of the pixel that landed there (both resampled NEAREST with the
    same geometry)."""
    rng_img = np.random.default_rng(0)
    h, w = 40, 60
    y = rng_img.integers(0, 11, (h, w)).astype(np.int32)
    q = np.zeros((h, w), bool)
    q[rng_img.integers(0, h, 30), rng_img.integers(0, w, 30)] = True
    x = Image.fromarray(rng_img.integers(0, 255, (h, w, 3), dtype=np.uint8))
    # unique per-pixel code so we can trace where each pixel went
    code = np.arange(h * w, dtype=np.int32).reshape(h, w)

    for seed in range(5):
        rng = random.Random(seed)
        rng2 = random.Random(seed)
        _, y_out, q_out, _ = geometric_augment(
            x, Image.fromarray(y, mode="I"), q, None, rng,
            crop_size=(32, 48), mean_fill=(0, 0, 0), ignore_index=11)
        _, code_out, q_out2, _ = geometric_augment(
            x, Image.fromarray(code, mode="I"), q, None, rng2,
            crop_size=(32, 48), mean_fill=(0, 0, 0), ignore_index=-7)
        np.testing.assert_array_equal(q_out, q_out2)
        ys, xs = np.nonzero(q_out)
        for yy, xx in zip(ys, xs):
            c = code_out[yy, xx]
            if c == -7:  # padding
                assert y_out[yy, xx] == 11
                continue
            src = np.unravel_index(c, (h, w))
            assert q[src], "query mask moved to a non-queried source pixel"
            assert y_out[yy, xx] == y[src]


def test_extract_sparse_labels_padding_and_void():
    q = np.zeros((5, 6), bool)
    q[0, 1] = q[2, 3] = q[4, 5] = True
    y = np.zeros((5, 6), np.int32)
    y[2, 3] = 11  # void
    y[4, 5] = 7
    coords, labels, valid = extract_sparse_labels(q, y, ignore_index=11, k_max=8)
    assert coords.shape == (8, 2) and valid.sum() == 2
    got = {(int(cy), int(cx)): (int(l), bool(v))
           for (cy, cx), l, v in zip(coords[:3], labels[:3], valid[:3])}
    assert got[(2, 3)] == (11, False)
    assert got[(4, 5)] == (7, True)
    assert not valid[3:].any()


def test_two_x_upscale_keeps_every_labelled_pixel():
    """Regression for the k_max truncation bug: a 2.0x random scale
    (nearest-resized query mask) duplicates each labelled pixel up to 4x;
    with scale-aware headroom no labelled pixel may ever be dropped
    (the reference's dense path never drops one, model.py:108-116)."""
    import pixelpick_tpu.data.base as base_mod

    class ForcedScale(random.Random):
        def uniform(self, a, b):  # random_scale draw -> always max scale
            return 2.0

        def random(self):  # hflip draw
            return 0.0

        def randint(self, a, b):  # crop offsets -> fixed
            return a

    h, w = 40, 60
    n_px = 30
    rng_img = np.random.default_rng(1)
    y = rng_img.integers(0, 11, (h, w)).astype(np.int32)
    q = np.zeros((h, w), bool)
    flat = rng_img.choice(h * w, n_px, replace=False)
    q.reshape(-1)[flat] = True
    x = Image.fromarray(rng_img.integers(0, 255, (h, w, 3), dtype=np.uint8))

    # crop the full scaled extent so every duplicate stays in frame
    _, y_out, q_out, _ = geometric_augment(
        x, Image.fromarray(y, mode="I"), q, None, ForcedScale(),
        crop_size=(2 * h, 2 * w), mean_fill=(0, 0, 0), ignore_index=11)
    n_in_crop = int(q_out.sum())
    assert n_in_crop == 4 * n_px  # every pixel duplicated exactly 2x2

    before = base_mod.SPARSE_OVERFLOW_COUNT
    k_max = 4 * n_px  # the scale-aware headroom base.py now applies
    coords, labels, valid = extract_sparse_labels(q_out, y_out, 11, k_max)
    assert base_mod.SPARSE_OVERFLOW_COUNT == before  # no silent drop
    ys, xs = np.nonzero(q_out)
    assert {(int(a), int(b)) for a, b in zip(ys, xs)} == \
        {(int(c[0]), int(c[1])) for c in coords[:n_in_crop]}

    # and the old budget (no headroom) would have overflowed -> warns + counts
    import warnings as _w
    before_px = base_mod.SPARSE_OVERFLOW_PIXELS
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        extract_sparse_labels(q_out, y_out, 11, n_px)
    # event count +1, pixel count += dropped (two units, never mixed)
    assert base_mod.SPARSE_OVERFLOW_COUNT == before + 1
    assert base_mod.SPARSE_OVERFLOW_PIXELS == before_px + (n_in_crop - n_px)


def test_dataset_k_max_carries_scale_headroom(tmp_path):
    """SegDatasetBase.k_max must be 4x the nominal budget when random_scale
    is enabled, and 1x when it is not."""
    from types import SimpleNamespace
    from pixelpick_tpu.data.base import SegDatasetBase

    def mk(random_scale):
        return SimpleNamespace(
            seed=0, ignore_index=11, n_classes=11, mean=[0.5] * 3,
            std=[0.25] * 3, dir_checkpoints=str(tmp_path),
            max_budget=100, n_init_pixels=10, n_pixels_by_us=10,
            augmentations={"geometric": {"random_scale": random_scale,
                                         "crop": True, "random_hflip": True},
                           "photometric": {}})

    assert SegDatasetBase(mk(True)).k_max == 4 * 110
    assert SegDatasetBase(mk(False)).k_max == 110


def test_extract_sparse_from_map():
    m = np.full((4, 4), 255, np.int64)
    m[1, 2] = 3
    m[3, 0] = 0
    coords, labels, valid = extract_sparse_from_map(m, 255, k_max=4)
    assert valid.sum() == 2
    assert sorted(labels[:2].tolist()) == [0, 3]


def test_cityscapes_lut_matches_reference_table():
    lut = classes_to_labels_lut()
    assert lut[7] == 0 and lut[26] == 13 and lut[33] == 18
    assert lut[0] == IGNORE and lut[6] == IGNORE and lut[29] == IGNORE
    # everything not in the 19-class table maps to ignore
    mapped = {7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28,
              31, 32, 33}
    for i in range(256):
        if i not in mapped:
            assert lut[i] == IGNORE


def test_loader_drop_last_quirk(tmp_path):
    """drop_last only when remainder == 1 AND only for train modes
    (reference utils/utils.py:107 scoped per data/loader.py docstring:
    the reference always builds val/query loaders at batch size 1 where
    the rule can never fire, so no val/pool image is ever dropped)."""
    from pixelpick_tpu.data.loader import Loader

    class FakeDS:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def val_sample(self, i):
            return {"x": np.full((2, 2), i, np.int32)}

        def train_sample(self, i, epoch, human_labels=False):
            return {"x": np.full((2, 2), i, np.int32)}

    # val: remainder-1 must NOT drop — every image reaches the metrics
    ld = Loader(FakeDS(9), batch_size=4, mode="val")
    assert not ld.drop_last and len(ld) == 3
    assert [b["x"].shape[0] for b in ld] == [4, 4, 1]

    ld2 = Loader(FakeDS(10), batch_size=4, mode="val")
    assert not ld2.drop_last and len(ld2) == 3
    assert [b["x"].shape[0] for b in ld2] == [4, 4, 2]

    # train: the reference quirk applies — remainder of exactly 1 drops
    ld3 = Loader(FakeDS(9), batch_size=4, mode="train")
    assert ld3.drop_last and len(ld3) == 2
    assert [b["x"].shape[0] for b in ld3] == [4, 4]

    ld4 = Loader(FakeDS(10), batch_size=4, mode="train")
    assert not ld4.drop_last and len(ld4) == 3


def test_loader_shuffle_is_deterministic_per_epoch():
    from pixelpick_tpu.data.loader import Loader

    class FakeDS:
        def __len__(self):
            return 8

        def val_sample(self, i):
            return {"x": np.array([i])}

    ld = Loader(FakeDS(), batch_size=4, mode="val", shuffle=True, seed=1)
    ld.set_epoch(1)
    o1 = [int(v) for b in ld for v in b["x"].ravel()]
    o1b = [int(v) for b in ld for v in b["x"].ravel()]
    assert o1 == o1b
    ld.set_epoch(2)
    o2 = [int(v) for b in ld for v in b["x"].ravel()]
    assert o1 != o2 and sorted(o2) == list(range(8))
