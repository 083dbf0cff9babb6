"""Cityscapes and VOC dataset classes on synthetic directory layouts."""

import os
import pickle as pkl

import numpy as np
import pytest
from PIL import Image

from pixelpick_tpu.config import default_args


def _make_cityscapes(root, n=3, hw=(64, 128)):
    """Raw cityscapes layout: full-res images + labelIds (class ids 0..33)."""
    rng = np.random.default_rng(0)
    for city in ("aaa",):
        for mode in ("train", "val"):
            dx = f"{root}/leftImg8bit/{mode}/{city}"
            dy = f"{root}/gtFine/{mode}/{city}"
            os.makedirs(dx, exist_ok=True)
            os.makedirs(dy, exist_ok=True)
            for i in range(n):
                img = rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
                lab = rng.integers(0, 34, hw).astype(np.uint8)
                Image.fromarray(img).save(f"{dx}/{city}_{i:06d}_leftImg8bit.png")
                Image.fromarray(lab).save(f"{dy}/{city}_{i:06d}_gtFine_labelIds.png")
    return root


def test_cityscapes_downsample_cache_and_queries(tmp_path):
    # note: the tmp dir name contains 'cityscapes' — guards against the
    # reference's substring-replace path bug (cityscapes.py:119-120)
    root = _make_cityscapes(str(tmp_path / "cityscapes"))
    import pixelpick_tpu.data.cityscapes as cs_mod

    args = default_args("cs", dir_dataset=root,
                        dir_checkpoints=str(tmp_path / "ck"),
                        n_pixels_by_us=5, downsample=4)
    os.makedirs(args.dir_checkpoints, exist_ok=True)
    ds = cs_mod.CityscapesDataset(args)
    assert len(ds) == 3
    assert ds.crop_size == (256, 512)
    # labels remapped into [0..19]
    y = ds._load_y(0)
    assert y.max() <= 19
    # init queries generated, non-void, stacked .npy caches written
    assert ds.n_pixels_total == 3 * 5
    assert os.path.isfile(f"{root}_d4/init_labelled_pixels_d4_0.npy")
    assert os.path.isfile(f"{args.dir_checkpoints}/0_query/label.npy")
    for q, (i) in zip(ds.queries, range(3)):
        assert (ds._load_y(i)[q] != 19).all()
    # train sample end-to-end (crop 256x512 > 16x32 source -> pads)
    s = ds.train_sample(0, epoch=1)
    assert s["x"].shape == (256, 512, 3)

    # second construction hits the cache
    ds2 = cs_mod.CityscapesDataset(args)
    np.testing.assert_array_equal(np.stack(ds2.queries), np.stack(ds.queries))


def test_cityscapes_val_builds_halfres_cache(tmp_path):
    """--downsample 4 with a VAL instance: the reference always evaluates
    at half resolution (cityscapes.py:25-28) but builds only the _d4 cache
    and then crashes reading _d2 on a fresh setup; here the val instance
    builds the _d2 cache it actually reads."""
    root = _make_cityscapes(str(tmp_path / "cityscapes"))
    import pixelpick_tpu.data.cityscapes as cs_mod

    args = default_args("cs", dir_dataset=root,
                        dir_checkpoints=str(tmp_path / "ck"),
                        n_pixels_by_us=5, downsample=4)
    os.makedirs(args.dir_checkpoints, exist_ok=True)
    ds_val = cs_mod.CityscapesDataset(args, val=True)  # fresh: no _d4 yet
    assert os.path.isfile(f"{root}_d2/.downsample_complete")
    assert len(ds_val) == 3
    y = ds_val._load_y(0)
    assert y.shape == (32, 64) and y.max() <= 19  # half res, remapped


def test_cityscapes_interrupted_cache_build_resumes(tmp_path):
    """A downsample build killed mid-way (cache dir exists, sentinel
    absent, files missing) is COMPLETED on the next construction — never
    blessed as done with the truncation intact."""
    root = _make_cityscapes(str(tmp_path / "cityscapes"))
    import pixelpick_tpu.data.cityscapes as cs_mod

    args = default_args("cs", dir_dataset=root,
                        dir_checkpoints=str(tmp_path / "ck"),
                        n_pixels_by_us=0, downsample=2)
    os.makedirs(args.dir_checkpoints, exist_ok=True)
    ds = cs_mod.CityscapesDataset(args)
    n_imgs = len(ds.list_inputs)
    # simulate the interrupted build the reference leaves behind: drop one
    # cached image+label pair and the sentinel
    os.remove(ds.list_inputs[-1])
    os.remove(ds.list_labels[-1])
    os.remove(f"{root}_d2/.downsample_complete")
    ds2 = cs_mod.CityscapesDataset(args)
    assert len(ds2.list_inputs) == n_imgs  # rebuilt, not blessed truncated
    assert os.path.isfile(f"{root}_d2/.downsample_complete")


def test_camvid_pairing_mismatch_detected(tmp_path):
    """One stray label file shifts positional (image, label) pairing — the
    constructor must refuse instead of silently training on wrong labels."""
    from tests.helpers import make_synthetic_camvid, synthetic_args

    args = synthetic_args(tmp_path, n_pixels_by_us=4, max_budget=4)
    # drop one annot: every later pair would silently shift
    os.remove(f"{args.dir_dataset}/trainannot/000.png")
    from pixelpick_tpu.data.camvid import CamVidDataset

    with pytest.raises(AssertionError):
        CamVidDataset(args)


def _make_voc(root, n=3):
    rng = np.random.default_rng(1)
    base = f"{root}/VOCdevkit/VOC2012"
    os.makedirs(f"{base}/ImageSets/Segmentation", exist_ok=True)
    os.makedirs(f"{base}/JPEGImages", exist_ok=True)
    os.makedirs(f"{base}/SegmentationClass", exist_ok=True)
    names = []
    sizes = [(60, 80), (90, 60), (70, 70)]
    for i in range(n):
        nm = f"2007_{i:06d}"
        names.append(nm)
        h, w = sizes[i % len(sizes)]
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
            f"{base}/JPEGImages/{nm}.jpg")
        lab = rng.integers(0, 21, (h, w)).astype(np.uint8)
        lab[0, :] = 255  # boundary void
        Image.fromarray(lab).save(f"{base}/SegmentationClass/{nm}.png")
    for split in ("train", "val"):
        with open(f"{base}/ImageSets/Segmentation/{split}.txt", "w") as f:
            f.write("\n".join(names) + "\n")
    return root


def test_voc_dataset_and_label_queries(tmp_path):
    root = _make_voc(str(tmp_path / "voc"))
    args = default_args("voc", dir_dataset=root,
                        dir_checkpoints=str(tmp_path / "ck"),
                        n_pixels_by_us=4, size_base=100, size_crop=64)
    os.makedirs(args.dir_checkpoints, exist_ok=True)
    from pixelpick_tpu.data.voc import VOC2012Segmentation

    ds = VOC2012Segmentation(args)
    assert len(ds) == 3
    assert ds.n_pixels_total == 3 * 4
    # queries live at base-resized size (longer side == size_base)
    for q in ds.queries:
        assert max(q.shape) == 100

    s = ds.train_sample(0, epoch=1)
    assert s["x"].shape == (64, 64, 3)
    assert s["coords"].shape[1] == 2

    # VOC label_queries takes raw mask lists (voc.py:108-124)
    new = [np.zeros_like(q) for q in ds.queries]
    new[0][0, 0] = True
    total = ds.label_queries(new, nth_query=1)
    assert total == 3 * 4 + 1
    assert os.path.isfile(f"{args.dir_checkpoints}/1_query/label.pkl")

    # val keeps original sizes
    v = ds_val = VOC2012Segmentation(args, val=True)
    sample = v.val_sample(1)
    assert sample["x"].shape[:2] == sample["y"].shape

    # query mode disables geometric augs
    qds = VOC2012Segmentation(args, query=True, generate_init_queries=False)
    qds.queries = ds.queries
    qs = qds.query_sample(0)
    assert max(qs["x"].shape[:2]) == 100
    assert qs["excluded"].shape == qs["y"].shape


def test_voc_augmented_dataset_path(tmp_path):
    """--use_augmented_dataset: {root}/images,{root}/annot name-matched
    pairs (reference voc.py:214-226); dir_augmented_dataset defaults under
    the VOC root (args.py:133) and is overridable."""
    rng = np.random.default_rng(5)
    root = _make_voc(str(tmp_path / "voc"))
    aug = f"{root}/VOCdevkit/VOC2012/train_aug"
    os.makedirs(f"{aug}/images", exist_ok=True)
    os.makedirs(f"{aug}/annot", exist_ok=True)
    for i in range(4):
        nm = f"aug_{i:04d}"
        Image.fromarray(rng.integers(0, 255, (50, 66, 3), dtype=np.uint8)
                        ).save(f"{aug}/images/{nm}.jpg")
        lab = rng.integers(0, 21, (50, 66)).astype(np.uint8)
        Image.fromarray(lab).save(f"{aug}/annot/{nm}.png")

    args = default_args("voc", dir_dataset=root,
                        dir_checkpoints=str(tmp_path / "ck"),
                        n_pixels_by_us=4, size_base=100, size_crop=64,
                        use_augmented_dataset=True)
    # the default derives from the VOC root (reference args.py:133)
    assert args.dir_augmented_dataset == \
        os.path.join(root, "VOCdevkit", "VOC2012", "train_aug")
    os.makedirs(args.dir_checkpoints, exist_ok=True)
    from pixelpick_tpu.data.voc import VOC2012Segmentation

    ds = VOC2012Segmentation(args)
    assert len(ds) == 4  # the augmented split, not train.txt
    assert ds.n_pixels_total == 4 * 4
    s = ds.train_sample(0, epoch=1)
    assert s["x"].shape == (64, 64, 3)
    # val still comes from the standard split
    ds_val = VOC2012Segmentation(args, val=True)
    assert len(ds_val) == 3

    # a missing augmented dir raises a clear error, not an AttributeError
    args2 = default_args("voc", dir_dataset=root,
                         dir_checkpoints=str(tmp_path / "ck2"),
                         use_augmented_dataset=True,
                         dir_augmented_dataset=str(tmp_path / "nope"))
    os.makedirs(args2.dir_checkpoints, exist_ok=True)
    with pytest.raises(FileNotFoundError):
        VOC2012Segmentation(args2)
