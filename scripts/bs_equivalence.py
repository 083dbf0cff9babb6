"""Does the fast/bench config (bs48 + ghost BN group 4) reproduce the
reference-schedule (bs4) optimization trajectory? (VERDICT r3 weak #1.)

Ghost BN provably preserves the reference's bs-4 BatchNorm *statistics*
(models/layers.py, measured free in PERF.md), but one 48-image Adam step
replaces twelve 4-image steps at unscaled LR — an optimization-trajectory
change no prior round measured. This script measures it on the synthetic
AL campaign (the accuracy north-star proxy, tests/test_al_learning.py):
two full campaigns per seed — identical data, seeds, budget, epochs; only
(batch_size, bn_group_size) differ — and reports the per-stage best val
mIoU curves and their final-round delta.

Runs on CPU (the real-data gate stays environment-blocked); results are
recorded in PARITY.md and drive scripts/parity-gate.sh's default config.

  python scripts/bs_equivalence.py --out /tmp/bs_equiv.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

N_TRAIN = 48          # 12 steps/epoch at bs4 vs 1 step/epoch at bs48 —
N_TEST = 8            # the same 12x step-count ratio as the real gate
N_PIXELS = 10
MAX_BUDGET = 30       # 3 AL stages
N_EPOCHS = 10


def _best_val_mious(args):
    mious, stage = [], 0
    while True:
        path = f"{args.dir_checkpoints}/{stage}_query/log_val.txt"
        try:
            with open(path) as f:
                lines = f.read().strip().splitlines()[1:]
        except FileNotFoundError:
            return mious
        mious.append(max(float(l.split(",")[1]) for l in lines))
        stage += 1


def run_campaign(tmp, seed: int, batch_size: int, bn_group_size: int,
                 lr_scale: float = 1.0, **extra):
    from helpers import make_learnable_camvid, synthetic_args

    args = synthetic_args(
        tmp,
        maker=lambda root: make_learnable_camvid(
            root, n_train=N_TRAIN, n_test=N_TEST, seed=0),
        query_strategy="margin_sampling", n_pixels_by_us=N_PIXELS,
        max_budget=MAX_BUDGET, n_epochs=N_EPOCHS, use_aug=False,
        batch_size=batch_size, bn_group_size=bn_group_size,
        val_batch_size=4, pool_batch_size=8, seed=seed,
        optimizer_params={"lr": 2e-3 * lr_scale, "betas": (0.9, 0.999),
                          "weight_decay": 2e-4, "eps": 1e-7},
        **extra,
    )
    from pixelpick_tpu.active.driver import ALModel

    model = ALModel(args)
    model.dataset.crop_size = (48, 64)
    t0 = time.time()
    model()
    model.close()
    return {"curve": _best_val_mious(args), "seconds": round(time.time() - t0, 1)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seeds", type=int, nargs="+", default=[0])
    parser.add_argument("--out", default="/tmp/bs_equiv.json")
    parser.add_argument("--epochs", type=int, default=None,
                        help="override N_EPOCHS (smoke runs)")
    parser.add_argument("--budget", type=int, default=None,
                        help="override MAX_BUDGET (smoke runs)")
    parser.add_argument("--n_train", type=int, default=None,
                        help="override N_TRAIN (gate-scale runs)")
    parser.add_argument("--n_test", type=int, default=None,
                        help="override N_TEST")
    parser.add_argument("--arms", nargs="+", default=None,
                        help="subset of arm names to run")
    parser.add_argument("--platform", default="cpu", choices=["cpu", "tpu"],
                        help="cpu (default; deterministic, no accelerator "
                             "needed) or tpu — the gate-scale question "
                             "(VERDICT r4 weak #3: can the fast config EVER "
                             "gate at 50 epochs / 367 images?) runs "
                             "`--platform tpu --n_train 367 --epochs 50`")
    cli = parser.parse_args()
    global N_EPOCHS, MAX_BUDGET, N_TRAIN, N_TEST
    if cli.epochs:
        N_EPOCHS = cli.epochs
    if cli.budget:
        MAX_BUDGET = cli.budget
    if cli.n_train:
        N_TRAIN = cli.n_train
    if cli.n_test:
        N_TEST = cli.n_test

    import jax

    if cli.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        from pixelpick_tpu.config import enable_compile_cache

        enable_compile_cache()

    all_arms = {
        "bs4_reference_schedule": dict(batch_size=4, bn_group_size=0),
        "bs48_ghost_bn4_fast": dict(batch_size=48, bn_group_size=4),
        # large-batch LR scaling candidates: linear (x12 = the step-count
        # ratio) and sqrt (x3.46, the usual Adam heuristic)
        "bs48_ghost_bn4_lr12x": dict(batch_size=48, bn_group_size=4,
                                     lr_scale=12.0),
        "bs48_ghost_bn4_lr3.46x": dict(batch_size=48, bn_group_size=4,
                                       lr_scale=12.0 ** 0.5),
        # megabatch scan of bs-4 updates (--micro_batch_size): the exact
        # reference schedule in one dispatch — must sit ON the bs4 curve
        # (update-for-update equality, tests/test_train_step.py)
        "bs48_micro4_megabatch": dict(batch_size=48, bn_group_size=0,
                                      micro_batch_size=4),
        # the same schedule in bf16 compute: does bf16 stay in the bs4
        # trajectory band? (gates bench.py's parity_trajectory_bf16)
        "bs48_micro4_bf16": dict(batch_size=48, bn_group_size=0,
                                 micro_batch_size=4, precision="bf16"),
        "bs4_bf16": dict(batch_size=4, bn_group_size=0, precision="bf16"),
    }
    arms = {k: v for k, v in all_arms.items()
            if not cli.arms or k in cli.arms}
    results = {"config": {"n_train": N_TRAIN, "n_pixels": N_PIXELS,
                          "max_budget": MAX_BUDGET, "n_epochs": N_EPOCHS},
               "seeds": {}}
    base = tempfile.mkdtemp(prefix="bs_equiv_")
    for seed in cli.seeds:
        per = {}
        for name, cfg in arms.items():
            d = os.path.join(base, f"s{seed}_{name}")
            os.makedirs(d, exist_ok=True)
            print(f"=== seed {seed} arm {name}: {cfg} ===", flush=True)
            from pathlib import Path
            per[name] = run_campaign(Path(d), seed, **cfg)
            print(f"    curve: {per[name]['curve']} "
                  f"({per[name]['seconds']}s)", flush=True)
        if "bs4_reference_schedule" in per and "bs48_ghost_bn4_fast" in per:
            ref = per["bs4_reference_schedule"]["curve"]
            fast = per["bs48_ghost_bn4_fast"]["curve"]
            per["final_delta_fast_minus_ref"] = round(fast[-1] - ref[-1], 4)
        results["seeds"][seed] = per
        with open(cli.out, "w") as f:
            json.dump(results, f, indent=2)
        print(json.dumps({seed: per}), flush=True)
    print(f"written: {cli.out}")


if __name__ == "__main__":
    main()
