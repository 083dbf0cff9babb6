"""End-to-end: two full AL rounds (train -> query -> oracle label -> train)
on a tiny synthetic CamVid-shaped dataset, CPU backend. Exercises the whole
stack: datasets, initial query generation, augmentation, sparse train step,
validation + best-checkpoint save, batched acquisition, codec round-trip,
per-round artifact layout (SURVEY.md §5 'crash-resumability by artifact')."""

import os
import pickle as pkl

import numpy as np
import pytest

from tests.helpers import synthetic_args


@pytest.fixture(scope="module")
def al_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("al")
    args = synthetic_args(tmp, n_pixels_by_us=5, max_budget=10, n_epochs=1,
                          top_n_percent=0.0)
    from pixelpick_tpu.active.driver import ALModel

    model = ALModel(args)
    # synthetic images are 48x64
    model.dataset.crop_size = (48, 64)
    model()
    return args, model


def test_round_artifacts_exist(al_run):
    args, _ = al_run
    d = args.dir_checkpoints
    # initial queries + round-1 picks
    assert os.path.isfile(f"{d}/0_query/queries.pkl")
    assert os.path.isfile(f"{d}/1_query/queries.pkl")
    assert os.path.isfile(f"{d}/0_query/query_stats.pkl")
    # the reference queries+labels BEFORE breaking on the final stage
    # (model.py:82-87), so the last round's picks exist on disk and
    # resume-by-rglob counts rounds identically
    assert os.path.isfile(f"{d}/2_query/queries.pkl")
    assert os.path.isfile(f"{d}/1_query/query_stats.pkl")
    # training artifacts per stage
    for stage in ("0_query", "1_query"):
        assert os.path.isfile(f"{d}/{stage}/log_train.txt")
        assert os.path.isfile(f"{d}/{stage}/log_val.txt")
        assert os.path.isfile(f"{d}/{stage}/best_miou_model.ckpt")
        with open(f"{d}/{stage}/log_val.txt") as f:
            lines = f.read().strip().splitlines()
        assert lines[0] == "epoch,mIoU,pixel_acc"
        assert len(lines) == 2  # 1 epoch


def test_query_budget_grows(al_run):
    args, model = al_run
    # 8 images x 5 px initial + 8 x 5 px from each of rounds 0 and 1
    # (the reference labels the final round's picks too before breaking,
    # model.py:82-87)
    assert model.dataset.n_pixels_total == 8 * 5 * 3


def test_round1_picks_disjoint_from_initial(al_run):
    args, _ = al_run
    from pixelpick_tpu.active import codec

    d = args.dir_checkpoints
    with open(f"{d}/0_query/queries.pkl", "rb") as f:
        q0 = codec.decode_queries(pkl.load(f))
    with open(f"{d}/1_query/queries.pkl", "rb") as f:
        q1 = codec.decode_queries(pkl.load(f))
    for a, b in zip(q0, q1):
        assert not np.logical_and(a, b).any(), "re-picked an already-labelled pixel"
        assert b.sum() == 5


def test_checkpoint_roundtrip(al_run):
    args, model = al_run
    import jax
    from pixelpick_tpu.engine.checkpoint import load_checkpoint
    from pixelpick_tpu.models import get_model, init_model

    m = get_model(args)
    params, stats = init_model(m, jax.random.PRNGKey(0), (48, 64))
    p2, s2 = load_checkpoint(
        f"{args.dir_checkpoints}/0_query/best_miou_model.ckpt", params, stats)
    leaves = jax.tree.leaves(p2)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_stats_pickle_contents(al_run):
    args, _ = al_run
    with open(f"{args.dir_checkpoints}/0_query/query_stats.pkl", "rb") as f:
        stats = pkl.load(f)
    assert set(stats) == {"label_distribution", "avg_entropy",
                          "avg_n_unique_labels", "avg_spatial_coverage"}
    assert sum(stats["label_distribution"].values()) == 8 * 5
