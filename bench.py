"""Benchmark: imgs/sec/chip for one CamVid AL round (train + pool scoring).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "imgs/sec/chip", "vs_baseline": N}

One AL round = ``n_epochs x n_train`` training images + ``n_train``
pool-scored images (reference ``model.py:67-87``; CamVid: 50 x 367 + 367).
``value`` is that image count divided by the projected round time from
steady-state step timings.

Two configurations are measured on the SAME chip:

- **tpu_native** (the headline): this framework's production path — bf16
  compute, batch 48 with ghost BN (bn_group_size=4 = the reference's bs-4
  BN statistics), device-resident batches (the --device_augment pipeline
  keeps data in HBM), sparse-label loss, batched pool scoring.
- **reference_design** (the baseline): the reference's algorithmic design
  transplanted unchanged — f32, batch 4 (args.py:109), dense full-resolution
  masked CE (model.py:108-116), batch-size-1 sequential pool sweep
  (query.py:159).

``vs_baseline`` = tpu_native / reference_design round throughput: the
speedup a reference user gets by switching frameworks on this hardware.
The reference repo publishes no throughput numbers of its own (BASELINE.md).

Synthetic data (only shapes matter). ``--fast`` skips the baseline;
the parity configs (per-dispatch f32/bs4 and the trajectory-exact
megabatch scan in f32 and bf16 — the reference's exact bs-4 update
schedule, ``--micro_batch_size``) are measured by default so the
recorded JSON always carries the trajectory-faithful number next to the
throughput headline (``--no-parity`` skips them).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _drain(carry):
    """Force TRUE completion of everything enqueued so far by fetching one
    scalar that data-depends on ``carry`` to the host. On the tunnelled
    backend ``jax.block_until_ready`` returns before the device has actually
    executed (verified: a 10-step 'blocked' window reads 6 ms/step while the
    fetch right after it waits out seconds of backlog), so any timing that
    ends in block_until_ready measures enqueue latency, not compute."""
    import jax
    import numpy as np

    leaf = jax.tree.leaves(carry)[0]
    return np.asarray(leaf).ravel()[0]


def _timeit_chained(fn, carry, windows=(10, 50)):
    """True steady-state seconds/step, artifact-proof on this stack.

    Two defenses, both load-bearing:
    - each call *depends on the previous call's output* (``fn(i, carry) ->
      carry``): independent dispatches overlap and read far above hardware
      peak (checked against compiled FLOPs);
    - the per-step time is the SLOPE between two window sizes, each window
      drained with a host fetch (see ``_drain``): the slope cancels the
      fixed dispatch/fetch overhead that a single short window mismeasures.
    """
    for i in range(3):
        carry = fn(1_000_000 + i, carry)
    _drain(carry)
    times = []
    for w, N in enumerate(windows):
        t0 = time.perf_counter()
        for i in range(N):
            carry = fn(2_000_000 + 10_000 * w + i, carry)
        _drain(carry)
        times.append(time.perf_counter() - t0)
    return (times[-1] - times[0]) / (windows[-1] - windows[0])


N_TRAIN = 367   # CamVid train-set size
N_EPOCHS = 50
K = 128


def _setup(precision, hw, bn_group_size=0):
    import jax

    from pixelpick_tpu.config import default_args
    from pixelpick_tpu.models import get_model, init_model

    args = default_args("cv", write_files=False, precision=precision,
                        bn_group_size=bn_group_size)
    model = get_model(args)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), hw)
    return args, model, params, batch_stats


def _train_batch(rng, B, hw, n_classes, device=True):
    import jax
    import jax.numpy as jnp

    b = {
        "x": rng.integers(0, 255, (B, *hw, 3), dtype=np.uint8),
        "coords": np.stack([rng.integers(0, hw[0], (B, K)),
                            rng.integers(0, hw[1], (B, K))], -1).astype(np.int32),
        "labels": rng.integers(0, n_classes, (B, K)).astype(np.int32),
        "valid": np.ones((B, K), bool),
    }
    return {k: jax.device_put(jnp.asarray(v)) for k, v in b.items()} if device else b


def _pool_batch(rng, B, hw, n_classes, device=True):
    import jax
    import jax.numpy as jnp

    b = {
        "x": rng.integers(0, 255, (B, *hw, 3), dtype=np.uint8),
        "y": rng.integers(0, n_classes, (B, *hw)).astype(np.int32),
        "excluded": np.zeros((B, *hw), bool),
    }
    return {k: jax.device_put(jnp.asarray(v)) for k, v in b.items()} if device else b


def _measure_round(args, model, params, batch_stats, *, train_B, pool_B,
                   hw, dense, device_batches, micro_bs: int = 0):
    import jax

    from pixelpick_tpu.engine.optim import make_optimizer
    from pixelpick_tpu.engine.trainer import (
        create_train_state, make_dense_train_step, make_microbatch_train_step,
        make_train_step,
    )
    from pixelpick_tpu.active.acquisition import make_score_fn

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    updates_per_epoch = N_TRAIN // (micro_bs or train_B)
    tx = make_optimizer(args, params, iters_per_epoch=updates_per_epoch)
    # deep-copied state: the production path donates the state buffers
    # (driver default), which must not alias the params the scoring phase
    # reads afterwards
    state = create_train_state(jax.tree.map(jnp.array, params),
                               jax.tree.map(jnp.array, batch_stats), tx)

    if dense:
        step = make_dense_train_step(model, tx, n_classes=args.n_classes,
                                     ignore_index=args.ignore_index,
                                     mean=args.mean, std=args.std, donate=True)
        batch = _pool_batch(rng, train_B, hw, args.n_classes, device_batches)
        batch = {"x": batch["x"], "y": batch["y"]}
    elif micro_bs:
        # megabatch scan: train_B // micro_bs sequential reference-schedule
        # updates per dispatch (engine/trainer.py:make_microbatch_train_step)
        step = make_microbatch_train_step(
            model, tx, micro_bs=micro_bs, n_classes=args.n_classes,
            mean=args.mean, std=args.std, donate=True)
        batch = _train_batch(rng, train_B, hw, args.n_classes, device_batches)
    else:
        step = make_train_step(model, tx, n_classes=args.n_classes,
                               mean=args.mean, std=args.std, donate=True)
        batch = _train_batch(rng, train_B, hw, args.n_classes, device_batches)
    t_train = _timeit_chained(
        lambda i, s: step(s, batch, jax.random.fold_in(key, i))[0], state)
    train_ips = train_B / t_train

    score_fn = make_score_fn(model, strategy="margin_sampling",
                             n_classes=args.n_classes, mean=args.mean,
                             std=args.std, n_pixels=10, top_n_percent=0.05,
                             reverse_order=False,
                             ignore_index=args.ignore_index)
    pool = _pool_batch(rng, pool_B, hw, args.n_classes, device_batches)

    def score_step(i, carry):
        # thread the previous picks into the key: forces true serialization
        k = jax.random.fold_in(jax.random.fold_in(key, i), carry[0, 0])
        idx, _stats = score_fn(params, batch_stats, pool, k)
        return idx

    idx0 = score_fn(params, batch_stats, pool, key)[0]
    t_score = _timeit_chained(score_step, idx0)
    query_ips = pool_B / t_score

    round_imgs = N_EPOCHS * N_TRAIN + N_TRAIN
    round_time = N_EPOCHS * N_TRAIN / train_ips + N_TRAIN / query_ips
    return round_imgs / round_time, train_ips, query_ips


def _init_backend_or_die(timeout_s: float = 600.0):
    """Fail fast (exit 3) if the accelerator backend never initialises.

    The axon TPU tunnel occasionally goes down; ``jax.devices()`` then
    blocks forever inside backend init and the bench would hang the round
    driver. The watchdog covers ONLY backend init — compiles afterwards
    may legitimately take tens of minutes cold."""
    import threading

    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            print(f"bench.py: jax backend init did not complete within "
                  f"{timeout_s:.0f}s (TPU tunnel down?) — aborting",
                  file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()
    import jax

    devices = jax.devices()
    done.set()
    print(f"bench.py: backend up: {devices}", file=sys.stderr, flush=True)


def main():
    from pixelpick_tpu.config import enable_compile_cache

    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--fast", action="store_true")
    parser.add_argument("--parity", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="also measure the parity configs (f32/bs4 and "
                             "the trajectory-exact megabatch in f32+bf16) — "
                             "default ON so the recorded bench always "
                             "carries the trajectory-faithful number next "
                             "to the throughput headline; --no-parity "
                             "skips them")
    parser.add_argument("--hw", type=int, nargs=2, default=[360, 480])
    args_cli = parser.parse_args()  # --help stays instant: parse first,
    _init_backend_or_die()          # only then touch the backend
    hw = tuple(args_cli.hw)

    # tpu-native production config. Honest (slope-drained) timing shows
    # imgs/s nearly flat in batch size on this chip (the step is
    # compute-bound, ~380-400 imgs/s at 360x480); bs48 amortises dispatch
    # without nearing the bs96 HBM ceiling
    # bn_group_size=4: the timed step carries the reference's bs-4 BN
    # *statistics* semantics (ghost BN, measured free). The optimization
    # TRAJECTORY at bs48 is NOT the reference's (12x fewer Adam steps/epoch
    # — measured behind the bs4 schedule on the synthetic AL campaign,
    # scripts/bs_equivalence.py; see PARITY.md). This headline is the
    # production throughput config; the accuracy gate runs the reference
    # bs4 schedule (scripts/parity-gate.sh).
    args, model, params, stats = _setup("bf16", hw, bn_group_size=4)
    value, train_ips, query_ips = _measure_round(
        args, model, params, stats, train_B=48, pool_B=32, hw=hw,
        dense=False, device_batches=True)

    result = {
        "metric": "CamVid MNv2 AL-round throughput (train 50ep + pool sweep)",
        "value": round(value, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": None,
        "detail": {
            "tpu_native": {"precision": "bf16", "batch": 48,
                           "bn_group_size": 4,
                           "train_imgs_per_sec": round(train_ips, 2),
                           "query_imgs_per_sec": round(query_ips, 2),
                           "input": "device-resident batches (the "
                                    "--device_augment production path; this "
                                    "host's 1-core loader augments ~30 "
                                    "imgs/s and cannot feed this rate)"},
        },
    }

    if args_cli.parity:
        # (1) literal per-dispatch bs4 (the reference's execution shape)
        argsp, modelp, paramsp, statsp = _setup("f32", hw)
        v_p, t_p, q_p = _measure_round(argsp, modelp, paramsp, statsp,
                                       train_B=4, pool_B=8, hw=hw,
                                       dense=False, device_batches=True)
        result["detail"]["parity_f32_bs4"] = {
            "round_imgs_per_sec": round(v_p, 2),
            "train_imgs_per_sec": round(t_p, 2),
            "query_imgs_per_sec": round(q_p, 2),
        }
        # (2) trajectory-exact megabatch: twelve sequential bs-4 updates in
        # ONE dispatch (lax.scan; --micro_batch_size 4) — the SAME reference
        # schedule (update count/order/BN moments/LR stepping, proven
        # bit-equal in tests/test_train_step.py) with the per-update
        # dispatch overhead amortised. THE parity-seeking user's config.
        v_m, t_m, q_m = _measure_round(argsp, modelp, paramsp, statsp,
                                       train_B=48, pool_B=32, hw=hw,
                                       dense=False, device_batches=True,
                                       micro_bs=4)
        result["detail"]["parity_trajectory"] = {
            "precision": "f32", "megabatch": 48, "micro_batch_size": 4,
            "round_imgs_per_sec": round(v_m, 2),
            "train_imgs_per_sec": round(t_m, 2),
            "query_imgs_per_sec": round(q_m, 2),
        }
        # (3) the same schedule in bf16 compute (trajectory validated on
        # the bs-equivalence harness, scripts/bs_equivalence.py arm
        # bs48_micro4_bf16 — see PARITY.md)
        argsb16, modelb16, paramsb16, statsb16 = _setup("bf16", hw)
        v_mb, t_mb, q_mb = _measure_round(argsb16, modelb16, paramsb16,
                                          statsb16, train_B=48, pool_B=32,
                                          hw=hw, dense=False,
                                          device_batches=True, micro_bs=4)
        result["detail"]["parity_trajectory_bf16"] = {
            "precision": "bf16", "megabatch": 48, "micro_batch_size": 4,
            "round_imgs_per_sec": round(v_mb, 2),
            "train_imgs_per_sec": round(t_mb, 2),
            "query_imgs_per_sec": round(q_mb, 2),
        }

    if not args_cli.fast:
        # reference design: f32, dense loss at bs4, bs-1 pool sweep
        argsb, modelb, paramsb, statsb = _setup("f32", hw)
        v_b, t_b, q_b = _measure_round(argsb, modelb, paramsb, statsb,
                                       train_B=4, pool_B=1, hw=hw,
                                       dense=True, device_batches=True)
        result["vs_baseline"] = round(value / v_b, 2)
        # NOT a torch measurement: the reference's algorithmic design
        # (f32, dense CE at bs4, bs-1 pool sweep) re-expressed in this
        # framework and timed on the same chip. Timing actual torch on this
        # 1-core CPU-less-host would measure the host, not the design.
        result["baseline_kind"] = "reference_design_in_jax_same_chip"
        result["detail"]["reference_design_in_jax"] = {
            "precision": "f32", "train_batch": 4, "pool_batch": 1,
            "round_imgs_per_sec": round(v_b, 2),
            "train_imgs_per_sec": round(t_b, 2),
            "query_imgs_per_sec": round(q_b, 2),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
