"""Long-horizon synthetic AL: proves the loop *learns* (VERDICT r1 §2ii).

Until real CamVid data is in the image, this is the accuracy north-star
proxy: on a colour-coded synthetic dataset (class identity recoverable from
pixel colour — tests/helpers.py:make_learnable_camvid), run multiple full AL
rounds (reference ``model.py:53-91`` round loop) and assert

1. the val-mIoU learning curve *rises* as the labelled-pixel budget grows
   round over round (fresh model each round, more supervision → better), and
2. margin sampling (reference ``query.py:205-209``) ends at least as high as
   random sampling under identical seeds — uncertainty targets the
   rectangle classes the uniform initial queries missed.

Runs on the CPU backend (tests/conftest.py). Augmentation is off so the
curve reflects supervision growth, not augmentation noise.
"""

import pytest

from tests.helpers import make_learnable_camvid, synthetic_args

N_PIXELS = 10
MAX_BUDGET = 30  # 3 AL stages after the initial uniform queries
N_EPOCHS = 8


def _best_val_mious(args):
    """Best val mIoU per AL stage, in stage order."""
    mious = []
    stage = 0
    while True:
        path = f"{args.dir_checkpoints}/{stage}_query/log_val.txt"
        try:
            with open(path) as f:
                lines = f.read().strip().splitlines()[1:]
        except FileNotFoundError:
            break
        mious.append(max(float(l.split(",")[1]) for l in lines))
        stage += 1
    return mious


def _run(tmp_path, strategy):
    args = synthetic_args(
        tmp_path, maker=make_learnable_camvid,
        query_strategy=strategy, n_pixels_by_us=N_PIXELS,
        max_budget=MAX_BUDGET, n_epochs=N_EPOCHS, use_aug=False,
        val_batch_size=4,
    )
    from pixelpick_tpu.active.driver import ALModel

    model = ALModel(args)
    model.dataset.crop_size = (48, 64)
    model()
    return _best_val_mious(args)


@pytest.fixture(scope="module")
def curves(tmp_path_factory):
    margin = _run(tmp_path_factory.mktemp("al_margin"), "margin_sampling")
    random = _run(tmp_path_factory.mktemp("al_random"), "random")
    return margin, random


def test_learning_curve_rises(curves):
    margin, _ = curves
    assert len(margin) == MAX_BUDGET // N_PIXELS
    # more labelled pixels -> a fresh model trains to a better val mIoU
    assert margin[-1] > margin[0] + 0.05, f"curve did not rise: {margin}"


def test_final_miou_is_real_learning(curves):
    margin, _ = curves
    # colour->class is easy; by the last round the model must be far above
    # the ~1/11 chance level
    assert margin[-1] > 0.35, f"final mIoU too low: {margin}"


def test_margin_beats_random(curves):
    margin, random = curves
    # identical seeds, data, and schedule; only the acquisition differs
    assert margin[-1] >= random[-1] - 1e-6, (
        f"margin {margin} vs random {random}")
