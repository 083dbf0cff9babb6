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
    # initial 4/img + picks from rounds 0 and 1 (the final round labels
    # too before breaking, model.py:82-87)
    assert model.dataset.n_pixels_total == 3 * 4 * 3


def test_bucketed_eval_mesh_rounding_matches_meshless(tmp_path):
    """The standalone eval CLI rounds val_batch_size up to a device-count
    multiple even for the bucketed (VOC) loader (cli/eval.py:57-66): the
    loader fills partial batches with fully-masked duplicates, so every
    bucketed batch shards evenly over the 8-virtual-device mesh. The
    confusion matrix is additive over images and duplicates carry only
    ignore labels, so the sharded sweep's metrics must equal the meshless
    bs-2 sweep's exactly."""
    import jax
    from pixelpick_tpu.cli.eval import evaluate
    from pixelpick_tpu.models import get_model, init_model

    args = _args(tmp_path)
    model = get_model(args)
    params, stats = init_model(model, jax.random.PRNGKey(0), (64, 64))

    sharded, cls_sharded = evaluate(args, params, stats)

    args.data_parallel = 1  # meshless: keeps val_batch_size=2 as-is
    plain, cls_plain = evaluate(args, params, stats)

    assert sharded["Mean IoU"] == plain["Mean IoU"]
    assert sharded["Pixel Acc"] == plain["Pixel Acc"]
    assert cls_sharded == cls_plain


def test_query_cli_bucketed_mixed_shapes(tmp_path, monkeypatch):
    """The standalone query CLI on a variable-size pool: mixed image shapes
    at pool_batch_size>1 must bucket (collate would np.stack-crash
    otherwise) and every pick must land inside its true image."""
    import pickle as pkl
    import shutil
    import sys

    import jax
    from pixelpick_tpu.active import codec
    from pixelpick_tpu.data.voc import compute_base_size
    from pixelpick_tpu.engine.checkpoint import save_checkpoint
    from pixelpick_tpu.models import get_model, init_model

    args = _args(tmp_path)
    root = args.dir_dataset
    base = f"{root}/VOCdevkit/VOC2012/JPEGImages"
    # the CLI rewrites pool paths to {dir_dataset}/train/{fname}
    # (reference query.py:388-410)
    os.makedirs(f"{root}/train", exist_ok=True)
    rng = np.random.default_rng(3)
    enc = {}
    for fn in sorted(os.listdir(base)):
        shutil.copy(f"{base}/{fn}", f"{root}/train/{fn}")
        with Image.open(f"{base}/{fn}") as im:
            w, h = im.size
        bh, bw = compute_base_size(h, w, args.size_base)
        ys = rng.integers(0, bh, 3)
        xs = rng.integers(0, bw, 3)
        enc[f"some/old/run/{fn}"] = {
            "height": bh, "width": bw, "x_coords": xs, "y_coords": ys,
            "category_id": rng.integers(0, 21, 3).tolist(),
        }
    os.makedirs(f"{args.dir_checkpoints}/0_query", exist_ok=True)
    with open(f"{args.dir_checkpoints}/0_query/queries.pkl", "wb") as f:
        pkl.dump(enc, f)

    model = get_model(args)
    params, stats = init_model(model, jax.random.PRNGKey(0), (64, 64))
    ckpt = f"{args.dir_checkpoints}/best.ckpt"
    save_checkpoint(ckpt, params, stats)

    import query as query_cli

    monkeypatch.setattr(sys, "argv", [
        "query.py", "--dataset_name", "voc",
        "--dir_datasets", os.path.dirname(root),
        "--dir_checkpoints", args.dir_checkpoints,
        "--p_state_dict", ckpt, "--n_pixels_by_us", "4",
        "--top_n_percent", "0.05", "--n_workers", "2",
        "--pool_batch_size", "2",
    ])
    # dataset block would overwrite dir_dataset; point dir_datasets at the
    # parent and name the dir VOC2012-compatible via a direct override
    monkeypatch.setenv("PYTHONHASHSEED", "0")
    import pixelpick_tpu.config as cfg

    orig_finalize = cfg.finalize_args

    def finalize(a, write_files=True):
        a.dir_dataset = root
        a = orig_finalize(a, write_files=write_files)
        a.size_base = 100  # after: the dataset block resets it to 400
        a.size_crop = 64
        return a

    monkeypatch.setattr(cfg, "finalize_args", finalize)
    monkeypatch.setattr(query_cli, "Arguments", cfg.Arguments)
    query_cli.main()

    out = f"{args.dir_checkpoints}/1_query/queries.pkl"
    assert os.path.isfile(out)
    with open(out, "rb") as f:
        picked = pkl.load(f)
    assert len(picked) == 3
    for p_img, info in picked.items():
        bh, bw = info["height"], info["width"]
        assert len(info["x_coords"]) == 4
        assert (np.asarray(info["y_coords"]) < bh).all()
        assert (np.asarray(info["x_coords"]) < bw).all()
