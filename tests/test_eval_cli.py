"""The standalone `eval.py` CLI main() (reference eval.py:97-134): builds
the val set from a dataset config, evaluates, writes log_val.txt and the
periodic 6-panel PNGs under {dir_checkpoints}/val/. (Checkpoint loading +
evaluate() numerics are covered by test_e2e_variants.py's round-trip.)"""

import os
import sys


def test_eval_cli_main(tmp_path, monkeypatch):
    import yaml

    from tests.helpers import synthetic_args

    args0 = synthetic_args(tmp_path, n_pixels_by_us=4, max_budget=4)
    os.rename(os.path.join(args0.dir_dataset, "test"),
              os.path.join(args0.dir_dataset, "val"))
    os.rename(os.path.join(args0.dir_dataset, "testannot"),
              os.path.join(args0.dir_dataset, "valannot"))
    cfg = dict(dataset_name="custom", dir_dataset=args0.dir_dataset,
               batch_size=4, n_epochs=1, crop_size=[48, 64],
               ignore_index=11, n_classes=11,
               mean=[0.5, 0.5, 0.5], std=[0.25, 0.25, 0.25],
               optimizer_type="Adam", lr_scheduler_type="MultiStepLR",
               optimizer_params={"lr": 5e-4, "betas": [0.9, 0.999],
                                 "weight_decay": 2e-4, "eps": 1e-7})
    p_cfg = tmp_path / "cfg.yaml"
    p_cfg.write_text(yaml.safe_dump(cfg))
    ckpt_dir = str(tmp_path / "eval_ckpt")

    # run 1 — reference cadence: --data_parallel 1 keeps the meshless bs-1
    # sweep, so the periodic PNGs land exactly as the reference's
    # per-image interval (eval.py:74-84)
    monkeypatch.setattr(sys, "argv", [
        "eval.py", "-pdc", str(p_cfg), "--dir_checkpoints", ckpt_dir,
        "--n_workers", "2", "--seed", "0", "--visualize_interval", "2",
        "--data_parallel", "1",
    ])
    from pixelpick_tpu.cli.eval import main

    main()

    d = os.path.join(ckpt_dir, "val")
    with open(os.path.join(d, "log_val.txt")) as f:
        rows = f.read().strip().splitlines()
    assert rows[0] == "epoch,miou,pixel_acc"
    epoch, miou, acc = rows[1].split(",")
    assert 0.0 <= float(miou) <= 1.0 and 0.0 <= float(acc) <= 1.0
    # periodic visualisation (reference eval.py:74-84): 4 val images,
    # interval 2 at val_batch_size 1 -> PNGs for images 0 and 2
    assert os.path.isfile(os.path.join(d, "0.png"))
    assert os.path.isfile(os.path.join(d, "2.png"))
    miou_bs1 = float(miou)

    # run 2 — TPU-first default: the standalone eval builds the device mesh
    # and rounds val_batch_size up to a device-count multiple (8 virtual
    # devices here), sharding the sweep like the driver's _val. Metrics are
    # identical (the confusion matrix is additive over images); vis maps
    # are computed for ONE image per step, so with the interval (2) smaller
    # than the batch (4 images in one batch) only the batch's first cadence
    # hit renders — 0.png, not 2.png.
    ckpt_dir2 = str(tmp_path / "eval_ckpt_mesh")
    monkeypatch.setattr(sys, "argv", [
        "eval.py", "-pdc", str(p_cfg), "--dir_checkpoints", ckpt_dir2,
        "--n_workers", "2", "--seed", "0", "--visualize_interval", "2",
    ])
    main()
    d2 = os.path.join(ckpt_dir2, "val")
    with open(os.path.join(d2, "log_val.txt")) as f:
        rows2 = f.read().strip().splitlines()
    assert float(rows2[1].split(",")[1]) == miou_bs1
    assert os.path.isfile(os.path.join(d2, "0.png"))
    assert not os.path.isfile(os.path.join(d2, "2.png"))


def test_eval_cli_cadence_multibatch(tmp_path, monkeypatch):
    """Per-image PNG cadence on a val set larger than the mesh-rounded
    batch: the cadence image falls mid-batch (traced ``vis_index``), the
    remainder batch is evaluated (never dropped — loader.py drop_last is
    train-only), and metrics match the meshless bs-1 sweep exactly."""
    import functools

    import yaml

    from tests.helpers import make_synthetic_camvid, synthetic_args

    args0 = synthetic_args(
        tmp_path, maker=functools.partial(make_synthetic_camvid, n_test=12),
        n_pixels_by_us=4, max_budget=4)
    os.rename(os.path.join(args0.dir_dataset, "test"),
              os.path.join(args0.dir_dataset, "val"))
    os.rename(os.path.join(args0.dir_dataset, "testannot"),
              os.path.join(args0.dir_dataset, "valannot"))
    cfg = dict(dataset_name="custom", dir_dataset=args0.dir_dataset,
               batch_size=4, n_epochs=1, crop_size=[48, 64],
               ignore_index=11, n_classes=11,
               mean=[0.5, 0.5, 0.5], std=[0.25, 0.25, 0.25],
               optimizer_type="Adam", lr_scheduler_type="MultiStepLR",
               optimizer_params={"lr": 5e-4, "betas": [0.9, 0.999],
                                 "weight_decay": 2e-4, "eps": 1e-7})
    p_cfg = tmp_path / "cfg.yaml"
    p_cfg.write_text(yaml.safe_dump(cfg))
    from pixelpick_tpu.cli.eval import main

    # meshless bs-1 reference cadence: PNGs at 0, 3, 6, 9
    ckpt_a = str(tmp_path / "ckpt_bs1")
    monkeypatch.setattr(sys, "argv", [
        "eval.py", "-pdc", str(p_cfg), "--dir_checkpoints", ckpt_a,
        "--n_workers", "2", "--seed", "0", "--visualize_interval", "3",
        "--data_parallel", "1",
    ])
    main()
    da = os.path.join(ckpt_a, "val")
    for i in (0, 3, 6, 9):
        assert os.path.isfile(os.path.join(da, f"{i}.png"))
    with open(os.path.join(da, "log_val.txt")) as f:
        miou_bs1 = float(f.read().strip().splitlines()[1].split(",")[1])

    # sharded: val_bs rounds 1 -> 8 on the 8-virtual-device mesh; batches
    # are [0..7] and the remainder [8..11]. First batch renders its first
    # cadence hit (0); second batch's first hit is image 9, mid-batch —
    # exercising vis_index > 0. Identical mIoU proves the remainder batch
    # was evaluated, not dropped.
    ckpt_b = str(tmp_path / "ckpt_mesh")
    monkeypatch.setattr(sys, "argv", [
        "eval.py", "-pdc", str(p_cfg), "--dir_checkpoints", ckpt_b,
        "--n_workers", "2", "--seed", "0", "--visualize_interval", "3",
    ])
    main()
    db = os.path.join(ckpt_b, "val")
    with open(os.path.join(db, "log_val.txt")) as f:
        miou_mesh = float(f.read().strip().splitlines()[1].split(",")[1])
    assert miou_mesh == miou_bs1
    assert os.path.isfile(os.path.join(db, "0.png"))
    assert os.path.isfile(os.path.join(db, "9.png"))
    assert not os.path.isfile(os.path.join(db, "3.png"))
    assert not os.path.isfile(os.path.join(db, "6.png"))
