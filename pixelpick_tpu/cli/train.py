"""Single-round training, optionally resuming from human-labelled query
files — reference ``train.py:179-254``: rglob all ``*/queries.pkl`` under
the checkpoint dir, merge them into per-image label maps, train on those
sparse human labels (no GT needed), evaluating every ``--eval_interval``
epochs with best-checkpoint saving."""

import os

import numpy as np

from pixelpick_tpu.active.codec import (
    gather_previous_query_files, merge_previous_query_files,
)
from pixelpick_tpu.active.driver import ALModel
from pixelpick_tpu.config import Arguments


def main():
    args = Arguments().parse_args()

    human = False
    merged_inputs = merged_maps = None
    prev_files = gather_previous_query_files(args.dir_checkpoints)
    if prev_files:
        merged = merge_previous_query_files(prev_files,
                                            ignore_index=args.ignore_index)
        merged_inputs, merged_maps = [], []
        for p_img, m in sorted(merged.items()):
            p = f"{args.dir_dataset}/train/{os.path.basename(p_img)}"
            assert os.path.exists(p), p
            merged_inputs.append(p)
            merged_maps.append(m)
        human = True
        args.nth_query = len(prev_files) - 1

    # merged inputs/maps go through the constructor (data/base.py:
    # set_human_inputs) so loader batch plans see the merged length and no
    # GT-side list can be read positionally misaligned
    model = ALModel(args, human_labels=human,
                    human_inputs=merged_inputs, human_maps=merged_maps)
    if human:
        model.nth_query = args.nth_query
        model._run_stage(f"{args.nth_query}_query")
    else:
        model.nth_query = 0
        model._run_stage("0_query" if args.n_pixels_by_us > 0 else "fully_sup")


if __name__ == "__main__":
    main()
