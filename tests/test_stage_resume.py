"""Mid-stage checkpoint/resume (--stage_ckpt_interval) and campaign
fast-forward (--resume_campaign) — production extras the reference lacks:
it never checkpoints optimizer state (model.py:207-216), so a crash 40
epochs into a 50-epoch stage loses the stage, and rerunning main_al
retrains every completed round from scratch."""

import os

import numpy as np
import pytest

from tests.helpers import synthetic_args


def _rows(path):
    with open(path) as f:
        return f.read().strip().splitlines()


def test_stage_resume_reproduces_uninterrupted_run(tmp_path):
    """Interrupt a 4-epoch stage after epoch 2 (snapshot on disk), build a
    fresh ALModel over the same checkpoint dir, re-run the stage: it must
    resume at epoch 3, append (not truncate) the logs, and finish with the
    exact params/batch_stats of an uninterrupted 4-epoch run."""
    from pixelpick_tpu.active.driver import ALModel

    def make(sub, interval):
        args = synthetic_args(tmp_path / sub, n_pixels_by_us=4, max_budget=4,
                              n_epochs=4, use_aug=False, batch_size=4,
                              stage_ckpt_interval=interval)
        model = ALModel(args)
        model.dataset.crop_size = (48, 64)
        model.nth_query = 0
        return args, model

    # arm A: straight 4-epoch stage
    args_a, model_a = make("straight", 0)
    params_a, stats_a = model_a._run_stage("0_query")
    model_a.close()

    # arm B: crash after epoch 2 (the snapshot interval), then resume
    args_b, model_b = make("resumed", 2)

    class Boom(RuntimeError):
        pass

    orig = model_b._train_epoch

    def crashing(epoch, state, step_fn, rng):
        if epoch == 3:
            raise Boom()
        return orig(epoch, state, step_fn, rng)

    model_b._train_epoch = crashing
    with pytest.raises(Boom):
        model_b._run_stage("0_query")
    model_b.close()
    p_snap = f"{args_b.dir_checkpoints}/0_query/stage_state.ckpt"
    assert os.path.isfile(p_snap)  # epoch-2 snapshot survived the crash

    # fresh process-equivalent: a new ALModel over the same dirs
    args_c, model_c = make("resumed", 2)
    params_b, stats_b = model_c._run_stage("0_query")
    model_c.close()
    assert not os.path.exists(p_snap)  # completed stage cleans up

    # logs: 4 epoch rows, appended across the interruption (1 header + 4)
    assert len(_rows(f"{args_b.dir_checkpoints}/0_query/log_train.txt")) == 5
    assert [r.split(",")[0] for r in
            _rows(f"{args_b.dir_checkpoints}/0_query/log_train.txt")[1:]] \
        == ["1", "2", "3", "4"]

    # the resumed trajectory equals the uninterrupted one exactly: the
    # snapshot restores the full TrainState (incl. Adam moments and the
    # LR step), and epochs 3-4 replay the identical programs/inputs
    import jax
    for pa, pb in zip(jax.tree.leaves((params_a, stats_a)),
                      jax.tree.leaves((params_b, stats_b))):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_resume_campaign_fast_forwards_completed_rounds(tmp_path):
    """A finished campaign re-run with --resume_campaign must not retrain:
    every round's next-round queries.pkl exists, so each fast-forwards by
    merging the recorded picks — final labelled state identical, logs
    untouched."""
    from pixelpick_tpu.active.driver import ALModel

    args = synthetic_args(tmp_path, n_pixels_by_us=4, max_budget=8,
                          n_epochs=1, use_aug=False, batch_size=4)
    model = ALModel(args)
    model.dataset.crop_size = (48, 64)
    model()
    n_px = model.dataset.n_pixels_total
    model.close()
    log0 = f"{args.dir_checkpoints}/0_query/log_train.txt"
    mtime = os.path.getmtime(log0)

    args.resume_campaign = True
    model2 = ALModel(args)
    model2.dataset.crop_size = (48, 64)
    model2()  # fast-forwards both rounds: no training, no new artifacts
    assert model2.dataset.n_pixels_total == n_px
    assert os.path.getmtime(log0) == mtime  # logs untouched
    model2.close()
