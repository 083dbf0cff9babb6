"""End-to-end variants: MC-dropout committee, reverse_order, entropy
strategy, fully-supervised mode, and checkpoint->eval round-trip."""

import numpy as np
import pytest

from tests.helpers import synthetic_args


def test_mc_dropout_entropy_round(tmp_path):
    args = synthetic_args(tmp_path, n_pixels_by_us=4, max_budget=4,
                          n_epochs=1, query_strategy="entropy",
                          use_mc_dropout=True, mc_n_steps=3,
                          top_n_percent=0.1, reverse_order=False)
    from pixelpick_tpu.active.driver import ALModel

    model = ALModel(args)
    model.dataset.crop_size = (48, 64)
    model()  # 1 stage (budget == per-round picks); the single stage still
    # queries+labels before breaking (model.py:82-87)
    assert model.dataset.n_pixels_total == 8 * 4 * 2


def test_reverse_order_round(tmp_path):
    args = synthetic_args(tmp_path, n_pixels_by_us=4, max_budget=8,
                          n_epochs=1, query_strategy="margin_sampling",
                          top_n_percent=0.05, reverse_order=True)
    from pixelpick_tpu.active.driver import ALModel

    model = ALModel(args)
    model.dataset.crop_size = (48, 64)
    model()
    assert model.dataset.n_pixels_total == 8 * 4 * 3


def test_microbatch_stage_tracks_bs4_schedule(tmp_path):
    """Driver-level trajectory exactness of --micro_batch_size (VERDICT r4
    next-step 1b): one training stage at batch_size=8/micro_batch_size=4
    must reproduce the batch_size=4 run update-for-update — same epoch
    ordering (shared shuffle permutation, coinciding partition boundaries),
    same dropout stream (both fold the stage rng by optimizer step), same
    BN moments. Exact math identity is proven bitwise in
    tests/test_train_step.py (jax.disable_jit); at the COMPILED level the
    scan-body program reassociates arithmetic vs the standalone step
    (<=1 ULP/step) and Adam's sqrt(nu) normalisation amplifies that noise
    chaotically (measured here: rel 4e-5 after epoch 1, 2e-3 after epoch
    2) — so the driver-level check asserts the loss curves TRACK (1e-2
    rel), not bit-match. Campaign-level statistical equivalence is the
    bs48_micro4_megabatch arm of scripts/bs_equivalence.py."""
    import os

    def run(sub, **kw):
        args = synthetic_args(tmp_path / sub, n_pixels_by_us=4, max_budget=4,
                              n_epochs=2, use_aug=False, **kw)
        from pixelpick_tpu.active.driver import ALModel

        model = ALModel(args)
        model.dataset.crop_size = (48, 64)
        model.nth_query = 0
        model._run_stage("0_query")
        model.close()
        d = f"{args.dir_checkpoints}/0_query"
        with open(f"{d}/log_train.txt") as f:
            train_rows = [r.split(",") for r in
                          f.read().strip().splitlines()[1:]]
        with open(f"{d}/log_val.txt") as f:
            val_rows = [r.split(",") for r in
                        f.read().strip().splitlines()[1:]]
        return ([float(r[3]) for r in train_rows],
                [float(r[1]) for r in val_rows])

    loss_ref, miou_ref = run("bs4", batch_size=4)
    loss_mb, miou_mb = run("mega", batch_size=8, micro_batch_size=4)
    np.testing.assert_allclose(loss_mb, loss_ref, rtol=1e-2)
    assert len(miou_mb) == len(miou_ref)


def test_fully_supervised_mode(tmp_path):
    args = synthetic_args(tmp_path, n_pixels_by_us=0, n_epochs=1)
    from pixelpick_tpu.active.driver import ALModel

    model = ALModel(args)
    model.dataset.crop_size = (48, 64)
    model()
    import os
    d = f"{args.dir_checkpoints}/fully_sup"
    assert os.path.isfile(f"{d}/best_miou_model.ckpt")
    assert os.path.isfile(f"{d}/log_train.txt")


def test_checkpoint_eval_roundtrip(tmp_path):
    args = synthetic_args(tmp_path, n_pixels_by_us=4, max_budget=4, n_epochs=1)
    from pixelpick_tpu.active.driver import ALModel

    model = ALModel(args)
    model.dataset.crop_size = (48, 64)
    model()

    import jax
    from eval import evaluate
    from pixelpick_tpu.engine.checkpoint import load_checkpoint
    from pixelpick_tpu.models import get_model, init_model

    m = get_model(args)
    params, stats = init_model(m, jax.random.PRNGKey(0), (48, 64))
    params, stats = load_checkpoint(
        f"{args.dir_checkpoints}/0_query/best_miou_model.ckpt", params, stats)
    scores, cls_iu = evaluate(args, params, stats)
    assert 0.0 <= scores["Mean IoU"] <= 1.0
    assert len(cls_iu) == args.n_classes


def test_fpn_al_round(tmp_path):
    """A full AL stage on the FPN/ResNet-18 model family — the whole
    driver path (train, val, query, label) works for the second network
    the reference ships (networks/model.py FPNSeg), not just DeepLab."""
    args = synthetic_args(tmp_path, n_pixels_by_us=4, max_budget=4,
                          n_epochs=1, network_name="FPN", n_layers=18,
                          query_strategy="margin_sampling",
                          top_n_percent=0, reverse_order=False)
    from pixelpick_tpu.active.driver import ALModel

    model = ALModel(args)
    model.dataset.crop_size = (48, 64)
    model()
    assert model.dataset.n_pixels_total == 8 * 4 * 2
    from pathlib import Path
    assert (Path(model.dir_checkpoints) / "1_query" / "queries.pkl").exists()
