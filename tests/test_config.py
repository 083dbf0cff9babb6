"""Config surface: per-dataset blocks, naming, YAML overlay (ref args.py)."""

import os

import pytest
import yaml

from pixelpick_tpu.config import Arguments, default_args


def test_camvid_block_defaults():
    args = default_args("cv")
    assert args.batch_size == 4 and args.n_classes == 11
    assert args.ignore_index == 11 and args.n_epochs == 50
    assert args.optimizer_type == "Adam"
    assert args.lr_scheduler_type == "MultiStepLR"
    assert args.optimizer_params["lr"] == 5e-4
    assert args.stride_total == 8  # use_dilated_resnet default True
    assert args.augmentations["geometric"]["random_scale"] is True


def test_cityscapes_and_voc_blocks():
    cs = default_args("cs")
    assert cs.n_classes == 19 and cs.ignore_index == 19
    assert cs.lr_scheduler_type == "Poly"
    voc = default_args("voc")
    assert voc.n_classes == 21 and voc.ignore_index == 255
    assert voc.batch_size == 10 and voc.size_base == 400 and voc.size_crop == 320
    assert voc.optimizer_type == "SGD"


def test_experim_name_building():
    # reference naming (args.py:154-180):
    # {ds}_{net}_{strategy}_{n_px}_p{top_n}_{seed}
    args = default_args("cv", n_pixels_by_us=10, top_n_percent=0.05, seed=3)
    assert args.experim_name == "cv_deeplab_margin_sampling_10_p0.05_3"

    args = default_args("cs", network_name="FPN", n_layers=50,
                        query_strategy="entropy", n_pixels_by_us=20,
                        top_n_percent=0.0, seed=0)
    assert args.experim_name == "cs_d4_FPN_50_supervised_entropy_20_0"

    args = default_args("cv", n_pixels_by_us=0)
    assert args.experim_name == "cv_deeplab_fully_sup_0"

    args = default_args("cv", use_mc_dropout=True, reverse_order=True, suffix="x")
    assert args.experim_name == "cv_deeplab_margin_sampling_soft_10_p0.05_reverse_0_x"


def test_yaml_overlay(tmp_path):
    cfg = {
        "dataset_name": "custom", "dir_dataset": "/data/x", "batch_size": 2,
        "ignore_index": 5, "n_classes": 5, "n_epochs": 3,
        "mean": [0.5] * 3, "std": [0.2] * 3,
        "optimizer_type": "SGD", "lr_scheduler_type": "Poly",
        "optimizer_params": {"lr": 0.01, "weight_decay": 5e-4, "momentum": 0.9},
        "mapping": {"A": "cat"}, "k_to_category_id": {"A": 0},
    }
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(cfg))
    parser = Arguments().parser
    args = parser.parse_args(["-pdc", str(p), "--dir_root", str(tmp_path)])
    from pixelpick_tpu.config import finalize_args
    args = finalize_args(args, write_files=False)
    assert args.n_classes == 5 and args.batch_size == 2
    assert args.mapping == {"A": "cat"}


def test_args_txt_written(tmp_path):
    args = default_args("cv", write_files=True,
                        dir_checkpoints=str(tmp_path / "ck"))
    assert os.path.isfile(f"{args.dir_checkpoints}/args.txt")


def test_visualiser_smoke(tmp_path):
    import numpy as np
    from pixelpick_tpu.utils.visualiser import Visualiser

    vis = Visualiser("cv")
    rng = np.random.default_rng(0)
    out = vis({
        "input": rng.integers(0, 255, (24, 32, 3), dtype=np.uint8),
        "target": rng.integers(0, 12, (24, 32)),
        "pred": rng.integers(0, 11, (24, 32)),
        "confidence": rng.random((24, 32)),
        "margin": -rng.random((24, 32)),
        "entropy": rng.random((24, 32)),
    }, fp=str(tmp_path / "vis.png"))
    assert os.path.isfile(tmp_path / "vis.png")
    assert out.width == 6 * 16 and out.height == 12
