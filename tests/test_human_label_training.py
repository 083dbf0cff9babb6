"""Human-in-the-loop training end-to-end (reference train.py:199-254):
two rounds of labelled queries.pkl on disk -> merge -> sparse training on
the merged human labels (no GT used)."""

import os
import pickle as pkl

import numpy as np

from tests.helpers import synthetic_args


def _write_labelled_round(dir_ckpt, nth, img_paths, hw, rng, n_px=4):
    d = f"{dir_ckpt}/{nth}_query"
    os.makedirs(d, exist_ok=True)
    enc = {}
    for p in img_paths:
        ys = rng.integers(0, hw[0], n_px)
        xs = rng.integers(0, hw[1], n_px)
        enc[p] = {"height": hw[0], "width": hw[1],
                  "y_coords": ys, "x_coords": xs,
                  "category": ["x"] * n_px,
                  "category_id": rng.integers(0, 11, n_px).tolist()}
    with open(f"{d}/queries.pkl", "wb") as f:
        pkl.dump(enc, f)


def test_train_on_merged_human_labels(tmp_path):
    args = synthetic_args(tmp_path, n_pixels_by_us=4, max_budget=4, n_epochs=1)
    from pixelpick_tpu.active.codec import (
        gather_previous_query_files, merge_previous_query_files,
    )
    from pixelpick_tpu.active.driver import ALModel

    rng = np.random.default_rng(0)
    img_paths = sorted(
        os.path.join(args.dir_dataset, "train", f)
        for f in os.listdir(os.path.join(args.dir_dataset, "train")))
    hl_dir = str(tmp_path / "human_ckpt")
    _write_labelled_round(hl_dir, 0, img_paths, (48, 64), rng)
    _write_labelled_round(hl_dir, 1, img_paths, (48, 64), rng)

    files = gather_previous_query_files(hl_dir)
    assert len(files) == 2
    merged = merge_previous_query_files(files, ignore_index=args.ignore_index,
                                        verbose=False)
    assert len(merged) == len(img_paths)
    # between 4 and 8 labelled pixels per image (rounds may collide)
    for m in merged.values():
        n = int((m != args.ignore_index).sum())
        assert 4 <= n <= 8

    model = ALModel(args, human_labels=True,
                    human_inputs=sorted(merged),
                    human_maps=[merged[p] for p in sorted(merged)])
    model.dataset.crop_size = (48, 64)
    # constructor-level wiring: GT label list cleared (human mode never
    # reads label files), loaders already sized to the merged inputs
    assert model.dataset.list_labels == []
    assert len(model.loader.dataset) == len(merged)
    model.nth_query = 1
    model._run_stage("1_query")

    d = f"{args.dir_checkpoints}/1_query"
    assert os.path.isfile(f"{d}/best_miou_model.ckpt")
    with open(f"{d}/log_train.txt") as f:
        rows = f.read().strip().splitlines()
    assert len(rows) == 2  # header + 1 epoch


def test_human_labels_with_mismatched_label_files(tmp_path):
    """Round-4 weak #6 closure: only a SUBSET of images got human labels —
    merged inputs no longer positionally align with the dataset's label
    files. The old post-construction ``list_inputs`` mutation silently read
    wrong-positional GT files (and left stale loader plans); the
    constructor path must train fine without touching any label file."""
    args = synthetic_args(tmp_path, n_pixels_by_us=4, max_budget=4,
                          n_epochs=1, batch_size=2)
    from pixelpick_tpu.active.codec import (
        gather_previous_query_files, merge_previous_query_files,
    )
    from pixelpick_tpu.active.driver import ALModel

    rng = np.random.default_rng(1)
    img_paths = sorted(
        os.path.join(args.dir_dataset, "train", f)
        for f in os.listdir(os.path.join(args.dir_dataset, "train")))
    subset = img_paths[: len(img_paths) // 2 + 1]  # odd-sized subset
    hl_dir = str(tmp_path / "human_ckpt")
    _write_labelled_round(hl_dir, 0, subset, (48, 64), rng)

    merged = merge_previous_query_files(
        gather_previous_query_files(hl_dir),
        ignore_index=args.ignore_index, verbose=False)
    assert 0 < len(merged) < len(img_paths)

    model = ALModel(args, human_labels=True,
                    human_inputs=sorted(merged),
                    human_maps=[merged[p] for p in sorted(merged)])
    model.dataset.crop_size = (48, 64)
    assert len(model.loader.dataset) == len(merged)
    # loader drop-last/batch plans were computed from the merged length
    assert len(model.loader) == -(-len(merged) // args.batch_size) - (
        1 if len(merged) % args.batch_size == 1 else 0)
    model.nth_query = 0
    model._run_stage("0_query")
    assert os.path.isfile(f"{args.dir_checkpoints}/0_query/log_train.txt")


def test_train_cli_main(tmp_path, monkeypatch):
    """The standalone `train.py` CLI (reference train.py:179-254): given a
    checkpoint dir holding one round of human-labelled queries.pkl and a
    dataset config, its main() merges them and trains a round.

    Uses the `custom` dataset family: it honors the YAML's crop_size /
    native image size. (`cv` would be reference-faithfully padded up to
    CamVid's hard-coded 360x480 — /root/reference/datasets/camvid.py:39 —
    which makes a 48x64 synthetic run ~55x more expensive for nothing.)"""
    import sys
    from pathlib import Path

    import yaml

    args0 = synthetic_args(tmp_path, n_pixels_by_us=4, max_budget=4,
                           n_epochs=1)
    os.rename(os.path.join(args0.dir_dataset, "test"),
              os.path.join(args0.dir_dataset, "val"))
    os.rename(os.path.join(args0.dir_dataset, "testannot"),
              os.path.join(args0.dir_dataset, "valannot"))
    rng = np.random.default_rng(3)
    img_paths = sorted(
        os.path.join(args0.dir_dataset, "train", f)
        for f in os.listdir(os.path.join(args0.dir_dataset, "train")))
    ckpt_dir = str(tmp_path / "cli_ckpt")
    _write_labelled_round(ckpt_dir, 0, img_paths, (48, 64), rng)

    # with -pdc the YAML must be self-contained: it REPLACES the dataset
    # block, exactly as the reference's if/else does (args.py:79-152)
    cfg = dict(dataset_name="custom", dir_dataset=args0.dir_dataset,
               batch_size=4, n_epochs=1, crop_size=[48, 64],
               ignore_index=11, n_classes=11,
               mean=[0.5, 0.5, 0.5], std=[0.25, 0.25, 0.25],
               optimizer_type="Adam", lr_scheduler_type="MultiStepLR",
               optimizer_params={"lr": 5e-4, "betas": [0.9, 0.999],
                                 "weight_decay": 2e-4, "eps": 1e-7})
    p_cfg = tmp_path / "cfg.yaml"
    p_cfg.write_text(yaml.safe_dump(cfg))

    monkeypatch.setattr(sys, "argv", [
        "train.py", "-pdc", str(p_cfg), "--dir_checkpoints", ckpt_dir,
        "--n_pixels_by_us", "4", "--n_workers", "2", "--seed", "0",
    ])
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import importlib
    train_cli = importlib.import_module("train")
    train_cli.main()

    d = Path(ckpt_dir) / "0_query"
    assert (d / "log_train.txt").exists()
    assert any(p.suffix == ".ckpt" for p in d.iterdir()) or \
        (d / "best_miou_model.ckpt").exists()
