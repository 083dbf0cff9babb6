"""TPU perf probe: time train-step / pool-scoring variants side by side.

Usage:  python scripts/perf_probe.py [--variants base,mm] [--hw 360 480]

Each variant compiles and times the FULL sparse-label train step (bf16,
bs48, ghost-BN group 4 — the bench headline config) with the honest
chained-slope protocol (bench._timeit_chained). Variants toggle one
implementation knob each so TPU measurements, not guesses, pick defaults:

  base   — current defaults
  mm     — set_conv3x3_impl('matmul'): decoder-head/ASPP 3x3s as 9 tap
           channel matmuls
  bn0    — whole-batch BN moments (no ghost groups)
  f32    — f32 compute (parity config reference point)
  score  — pool scoring (bs32) instead of the train step
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")
from bench import _timeit_chained, _setup, _train_batch, _pool_batch, K  # noqa: E402


def time_train(precision, bn_groups, train_B, hw, conv3x3="xla", dw="xla",
               s2d=False, remat=False, fused_ir=False):
    import jax

    import pixelpick_tpu.models.layers as layers
    from pixelpick_tpu.engine.optim import make_optimizer
    from pixelpick_tpu.engine.trainer import create_train_state, make_train_step

    layers.set_conv3x3_impl(conv3x3)
    layers.set_depthwise_impl(dw)
    try:
        args, model, params, batch_stats = _setup(precision, hw, bn_groups)
        if s2d:
            model = model.clone(s2d_until=4)
        if remat:
            model = model.clone(remat_blocks=True)
        if fused_ir:
            model = model.clone(fused_ir=True)
        import jax.numpy as jnp

        tx = make_optimizer(args, params, iters_per_epoch=100)
        state = create_train_state(jax.tree.map(jnp.array, params),
                                   jax.tree.map(jnp.array, batch_stats), tx)
        step = make_train_step(model, tx, n_classes=args.n_classes,
                               mean=args.mean, std=args.std, donate=True)
        rng = np.random.default_rng(0)
        batch = _train_batch(rng, train_B, hw, args.n_classes)
        key = jax.random.PRNGKey(0)
        t = _timeit_chained(
            lambda i, s: step(s, batch, jax.random.fold_in(key, i))[0], state)
        return {"sec_per_step": t, "imgs_per_sec": train_B / t,
                "ms_per_img": 1000 * t / train_B}
    finally:
        layers.set_conv3x3_impl("xla")
        layers.set_depthwise_impl("xla")


def time_score(precision, pool_B, hw, conv3x3="xla"):
    import jax

    import pixelpick_tpu.models.layers as layers
    from pixelpick_tpu.active.acquisition import make_score_fn

    layers.set_conv3x3_impl(conv3x3)
    try:
        args, model, params, batch_stats = _setup(precision, hw, 4)
        score_fn = make_score_fn(model, strategy="margin_sampling",
                                 n_classes=args.n_classes, mean=args.mean,
                                 std=args.std, n_pixels=10, top_n_percent=0.05,
                                 reverse_order=False,
                                 ignore_index=args.ignore_index)
        rng = np.random.default_rng(0)
        pool = _pool_batch(rng, pool_B, hw, args.n_classes)
        key = jax.random.PRNGKey(0)

        def score_step(i, carry):
            k = jax.random.fold_in(jax.random.fold_in(key, i), carry[0, 0])
            idx, _ = score_fn(params, batch_stats, pool, k)
            return idx

        idx0 = score_fn(params, batch_stats, pool, key)[0]
        t = _timeit_chained(score_step, idx0)
        return {"sec_per_step": t, "imgs_per_sec": pool_B / t}
    finally:
        layers.set_conv3x3_impl("xla")


VARIANTS = {
    "base": lambda hw: time_train("bf16", 4, 48, hw),
    "mm": lambda hw: time_train("bf16", 4, 48, hw, conv3x3="matmul"),
    "bn0": lambda hw: time_train("bf16", 0, 48, hw),
    "nodwgrad": lambda hw: time_train("bf16", 4, 48, hw, dw="xla_nowgrad"),
    "s2d": lambda hw: time_train("bf16", 4, 48, hw, s2d=True),
    "s2d_mm": lambda hw: time_train("bf16", 4, 48, hw, s2d=True,
                                    conv3x3="matmul"),
    "wmm": lambda hw: time_train("bf16", 4, 48, hw, conv3x3="wgradmm"),
    "remat": lambda hw: time_train("bf16", 4, 48, hw, remat=True),
    "fused": lambda hw: time_train("bf16", 4, 48, hw, fused_ir=True),
    "f32": lambda hw: time_train("f32", 0, 4, hw),
    "score": lambda hw: time_score("bf16", 32, hw),
    "score_mm": lambda hw: time_score("bf16", 32, hw, conv3x3="matmul"),
}


def main():
    from pixelpick_tpu.config import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", type=str, default="base,mm")
    ap.add_argument("--hw", type=int, nargs=2, default=[360, 480])
    a = ap.parse_args()
    hw = tuple(a.hw)
    out = {}
    for name in a.variants.split(","):
        out[name] = VARIANTS[name](hw)
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
