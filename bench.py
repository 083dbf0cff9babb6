"""Benchmark: imgs/sec/chip for one CamVid AL round (train + pool scoring).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "imgs/sec/chip", "vs_baseline": N}

The measured quantity is round-level throughput on the flagship config
(CamVid 360x480, MobileNetV2 DeepLabv3+, margin sampling): one AL round =
``n_epochs x n_train`` training images + ``n_train`` pool-scored images
(reference ``model.py:67-87``). ``value`` is that image count divided by the
projected round time from steady-state step timings.

``vs_baseline`` is the speedup over a *reference-faithful* execution on the
SAME chip: dense full-resolution masked-CE training (the reference densifies
labels and upsamples logits, ``model.py:108-116``) and a batch-size-1
sequential pool sweep (``query.py:159``) — i.e. the reference's algorithmic
design transplanted to this hardware. The optimized path uses the
sparse-label train step and batched acquisition. The published reference
repo has no throughput numbers to compare against (BASELINE.md).

Synthetic data (shapes only matter); run with --fast to skip the baseline.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _timeit(fn, *args, warmup=2, iters=8):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from pixelpick_tpu.config import enable_compile_cache

    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--fast", action="store_true",
                        help="skip the reference-faithful baseline")
    parser.add_argument("--precision", default="f32", choices=["f32", "bf16"])
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--pool_batch_size", type=int, default=8)
    parser.add_argument("--hw", type=int, nargs=2, default=[360, 480])
    args_cli = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from pixelpick_tpu.config import default_args
    from pixelpick_tpu.engine.optim import make_optimizer
    from pixelpick_tpu.engine.trainer import (
        create_train_state, make_dense_train_step, make_train_step,
    )
    from pixelpick_tpu.active.acquisition import make_score_fn
    from pixelpick_tpu.models import get_model, init_model

    hw = tuple(args_cli.hw)
    B = args_cli.batch_size
    K = 128
    N_TRAIN = 367          # CamVid train set size
    N_EPOCHS = 50

    args = default_args("cv", write_files=False, precision=args_cli.precision)
    model = get_model(args)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), hw)
    tx = make_optimizer(args, params, iters_per_epoch=N_TRAIN // B)
    state = create_train_state(params, batch_stats, tx)

    rng = np.random.default_rng(0)
    train_batch = {
        "x": rng.integers(0, 255, (B, *hw, 3), dtype=np.uint8),
        "coords": np.stack([rng.integers(0, hw[0], (B, K)),
                            rng.integers(0, hw[1], (B, K))], -1).astype(np.int32),
        "labels": rng.integers(0, args.n_classes, (B, K)).astype(np.int32),
        "valid": np.ones((B, K), bool),
    }
    key = jax.random.PRNGKey(0)

    # ---- optimized: sparse-label train step ----
    sparse_step = make_train_step(model, tx, n_classes=args.n_classes,
                                  mean=args.mean, std=args.std, donate=False)
    t_sparse = _timeit(lambda s: sparse_step(s, train_batch, key)[0], state)
    train_ips = B / t_sparse

    # ---- optimized: batched pool scoring ----
    PB = args_cli.pool_batch_size
    score_fn = make_score_fn(model, strategy="margin_sampling",
                             n_classes=args.n_classes, mean=args.mean,
                             std=args.std, n_pixels=10, top_n_percent=0.05,
                             reverse_order=False, ignore_index=args.ignore_index)
    pool_batch = {
        "x": rng.integers(0, 255, (PB, *hw, 3), dtype=np.uint8),
        "y": rng.integers(0, args.n_classes, (PB, *hw)).astype(np.int32),
        "excluded": np.zeros((PB, *hw), bool),
    }
    t_score = _timeit(lambda: score_fn(params, batch_stats, pool_batch, key))
    query_ips = PB / t_score

    round_imgs = N_EPOCHS * N_TRAIN + N_TRAIN
    round_time = N_EPOCHS * N_TRAIN / train_ips + N_TRAIN / query_ips
    value = round_imgs / round_time

    result = {
        "metric": "CamVid MNv2 AL-round throughput (train 50ep + pool sweep)",
        "value": round(value, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": None,
        "detail": {
            "train_imgs_per_sec": round(train_ips, 2),
            "query_imgs_per_sec": round(query_ips, 2),
            "precision": args_cli.precision,
            "batch_size": B,
            "pool_batch_size": PB,
        },
    }

    if not args_cli.fast:
        # ---- reference-faithful baseline on the same chip ----
        dense_step = make_dense_train_step(
            model, tx, n_classes=args.n_classes,
            ignore_index=args.ignore_index, mean=args.mean, std=args.std,
            donate=False)
        dense_batch = {
            "x": train_batch["x"],
            "y": rng.integers(0, args.n_classes, (B, *hw)).astype(np.int32),
        }
        t_dense = _timeit(lambda s: dense_step(s, dense_batch, key)[0], state)
        base_train_ips = B / t_dense

        score1 = make_score_fn(model, strategy="margin_sampling",
                               n_classes=args.n_classes, mean=args.mean,
                               std=args.std, n_pixels=10, top_n_percent=0.05,
                               reverse_order=False,
                               ignore_index=args.ignore_index)
        pool1 = {k: v[:1] for k, v in pool_batch.items()}
        t_score1 = _timeit(lambda: score1(params, batch_stats, pool1, key))
        base_query_ips = 1.0 / t_score1

        base_time = (N_EPOCHS * N_TRAIN / base_train_ips
                     + N_TRAIN / base_query_ips)
        result["vs_baseline"] = round(base_time / round_time, 2)
        result["detail"]["baseline_train_imgs_per_sec"] = round(base_train_ips, 2)
        result["detail"]["baseline_query_imgs_per_sec"] = round(base_query_ips, 2)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
