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

    model = ALModel(args, human_labels=True)
    model.dataset.crop_size = (48, 64)
    model.dataset.list_inputs = sorted(merged)
    model.dataset.update_labelled_queries([merged[p] for p in sorted(merged)])
    model.nth_query = 1
    model._run_stage("1_query")

    d = f"{args.dir_checkpoints}/1_query"
    assert os.path.isfile(f"{d}/best_miou_model.ckpt")
    with open(f"{d}/log_train.txt") as f:
        rows = f.read().strip().splitlines()
    assert len(rows) == 2  # header + 1 epoch
