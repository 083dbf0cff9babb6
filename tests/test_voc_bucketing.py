"""VOC variable-size shape bucketing (SURVEY §7 hard-part 5, VERDICT r1 §6).

The reference evaluates/queries VOC one image at a time at its native size
(``eval.py:49-60``, ``query.py:158``); through a compile-per-shape XLA
backend that is one compilation per distinct image size. The Loader instead
groups images into ≤2 orientation buckets (landscape/portrait), pads each to
its bucket shape (labels with the ignore index — dropped by the confusion
matrix; ``excluded`` with True — never picked by acquisition), and fills
partial batches with masked duplicates, so a whole val/query sweep compiles
exactly one XLA program per bucket.
"""

import os

import numpy as np
import pytest
from PIL import Image

from pixelpick_tpu.config import default_args
from pixelpick_tpu.data.loader import Loader, pad_sample_to

from tests.test_datasets_cs_voc import _make_voc


def _args(tmp_path, **kw):
    root = _make_voc(str(tmp_path / "voc"))
    # use_aug stays True: the train crop to size_crop is what gives VOC
    # train batches a fixed shape (voc.py train_sample)
    defaults = dict(dir_dataset=root, dir_checkpoints=str(tmp_path / "ck"),
                    n_pixels_by_us=4, size_base=100, size_crop=64,
                    batch_size=2, pool_batch_size=2, val_batch_size=2,
                    n_epochs=1, max_budget=8, n_workers=2)
    defaults.update(kw)
    args = default_args("voc", **defaults)
    os.makedirs(args.dir_checkpoints, exist_ok=True)
    return args


def test_pad_sample_to_masks_everything():
    s = {"x": np.ones((5, 7, 3), np.uint8) * 9,
         "y": np.zeros((5, 7), np.int32),
         "excluded": np.zeros((5, 7), bool)}
    p = pad_sample_to(s, (8, 8), pad_label=255)
    assert p["x"].shape == (8, 8, 3) and p["y"].shape == (8, 8)
    assert (p["y"][5:] == 255).all() and (p["y"][:, 7:] == 255).all()
    assert p["excluded"][5:].all() and p["excluded"][:, 7:].all()
    assert (p["y"][:5, :7] == 0).all() and not p["excluded"][:5, :7].any()
    # edge padding replicates the border pixel
    assert (p["x"][5:, :7] == 9).all()


def test_val_loader_buckets(tmp_path):
    args = _args(tmp_path)
    from pixelpick_tpu.data.voc import VOC2012Segmentation

    ds = VOC2012Segmentation(args, val=True)
    loader = Loader(ds, 2, mode="val", n_workers=2,
                    bucket_stride=args.stride_total,
                    pad_label=args.ignore_index)
    # images: (60,80) landscape; (90,60) and (70,70) portrait/square
    plan = loader._bucket_plan()
    assert len(plan) == 2
    shapes = sorted(hw for hw, _ in plan)
    for h, w in shapes:
        assert h % args.stride_total == 0 and w % args.stride_total == 0

    batches = list(loader)
    assert len(batches) == len(loader)
    seen = set()
    batch_shapes = set()
    for b in batches:
        assert b["x"].shape[0] == 2  # partial batches are filled
        batch_shapes.add(b["x"].shape[1:3])
        for i, (h, w) in zip(b["index"], b["hw"]):
            if i < 0:  # masked duplicate: contributes nothing
                row = list(b["index"]).index(i)
                assert (b["y"][row] == args.ignore_index).all()
                continue
            seen.add(int(i))
            assert (b["y"][int(np.where(b["index"] == i)[0][0]),
                           h:, :] == args.ignore_index).all()
    assert seen == {0, 1, 2}
    assert len(batch_shapes) <= 2  # one compiled shape per bucket


def test_query_loader_pads_excluded(tmp_path):
    args = _args(tmp_path)
    from pixelpick_tpu.data.voc import VOC2012Segmentation

    ds = VOC2012Segmentation(args)
    qds = VOC2012Segmentation(args, query=True, generate_init_queries=False)
    qds.queries = ds.queries
    loader = Loader(qds, 2, mode="query", n_workers=2,
                    bucket_stride=args.stride_total,
                    pad_label=args.ignore_index)
    for b in loader:
        for row, (i, (h, w)) in enumerate(zip(b["index"], b["hw"])):
            if i < 0:
                assert b["excluded"][row].all()
            else:
                assert b["excluded"][row, h:, :].all()
                assert b["excluded"][row, :, w:].all()


@pytest.mark.slow
def test_voc_e2e_al_round(tmp_path):
    """Full driver round on synthetic VOC: train -> bucketed val -> bucketed
    query -> oracle label; query masks land back at true base-resized
    shapes and every pick is a real (non-pad) pixel."""
    args = _args(tmp_path)
    from pixelpick_tpu.active.driver import ALModel
    from pixelpick_tpu.data.voc import compute_base_size

    model = ALModel(args)
    model()
    d = args.dir_checkpoints
    assert os.path.isfile(f"{d}/0_query/log_val.txt")
    assert os.path.isfile(f"{d}/1_query/log_val.txt")
    # the oracle-labelled masks keep their true per-image shapes
    for i, q in enumerate(model.dataset.queries):
        with Image.open(model.dataset.list_inputs[i]) as im:
            w, h = im.size
        assert q.shape == compute_base_size(h, w, args.size_base)
    # initial 4/img + round-0 picks 4/img
    assert model.dataset.n_pixels_total == 3 * 4 * 2
