"""Long-horizon synthetic AL: proves the loop *learns* (VERDICT r1 §2ii).

Until real CamVid data is in the image, this is the accuracy north-star
proxy: on a colour-coded synthetic dataset (class identity recoverable from
pixel colour — tests/helpers.py:make_learnable_camvid, which neutralises
the global-context memorisation shortcut and plants one confusable colour
pair), run two multi-round AL campaigns (reference ``model.py:53-91`` round
loop) under identical seeds and assert

1. the val-mIoU learning curve *rises* as the labelled-pixel budget grows
   round over round (fresh model each round, more supervision → better),
2. the final mIoU is far above any label-blind baseline, and
3. margin sampling (reference ``query.py:205-209``) beats random sampling —
   uncertainty picks concentrate on the confusable-pair decision boundary,
   where extra labels buy the most accuracy.

Runs on the CPU backend (tests/conftest.py). Augmentation is off so the
curve reflects supervision growth, not augmentation noise.
"""

import pytest

from tests.helpers import make_learnable_camvid, synthetic_args

N_PIXELS = 10
MAX_BUDGET = 30  # 3 AL stages after the initial uniform queries
N_EPOCHS = 15


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
        optimizer_params={"lr": 2e-3, "betas": (0.9, 0.999),
                          "weight_decay": 2e-4, "eps": 1e-7},
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


pytestmark = pytest.mark.slow  # two full AL runs, ~20 min on 1 CPU core


def test_learning_curve_rises(curves):
    margin, _ = curves
    assert len(margin) == MAX_BUDGET // N_PIXELS
    # more labelled pixels -> a fresh model trains to a better val mIoU
    # (measured [0.081, 0.135, 0.185]: +0.104 first->last)
    assert margin[-1] > margin[0] + 0.05, f"curve did not rise: {margin}"


def test_final_miou_is_real_learning(curves):
    margin, _ = curves
    # a label-blind predictor scores ~0.02-0.03 mIoU on 11 classes; 0.15 is
    # only reachable by actually learning the colour->class mapping
    # (measured final: 0.185)
    assert margin[-1] > 0.15, f"final mIoU too low: {margin}"


def test_margin_beats_random(curves):
    margin, random = curves
    # identical seeds, data, and schedule; only the acquisition differs.
    # The confusable-pair design gives uncertainty sampling a real edge —
    # a STRICT gap is asserted so this evidence cannot decay into a tie
    # (measured r3: margin 0.196 vs random 0.163 at the final round)
    assert margin[-1] > random[-1] + 0.01, (
        f"margin no longer beats random: {margin} vs {random}")
    assert all(m >= r - 0.02 for m, r in zip(margin, random)), (
        f"margin fell behind mid-curve: {margin} vs {random}")
