"""Dropout-RNG cost probe: threefry vs rbg on the train step.

The decoder's Dropout(0.5) draws ~132M random bits per bs-48 step
(90x120x256x48); threefry generates them in VPU ALU ops, the TPU-native
``rbg`` generator is much cheaper. Honest slope-drain timing of the full
train step under both PRNG implementations.

Usage: python scripts/probe_rng.py [--impl rbg|threefry] [--bs 48]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--impl", default="rbg", choices=["rbg", "threefry"])
    p.add_argument("--bs", type=int, default=48)
    args_cli = p.parse_args()

    import jax

    if args_cli.impl == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")

    import jax.numpy as jnp

    from pixelpick_tpu.config import default_args, enable_compile_cache
    from pixelpick_tpu.engine.optim import make_optimizer
    from pixelpick_tpu.engine.trainer import create_train_state, make_train_step
    from pixelpick_tpu.models import get_model, init_model

    enable_compile_cache()
    B = args_cli.bs
    hw = (360, 480)
    K = 128
    args = default_args("cv", write_files=False, precision="bf16")
    model = get_model(args)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), hw)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    tx = make_optimizer(args, params, iters_per_epoch=367 // B)
    state = create_train_state(jax.tree.map(jnp.array, params),
                               jax.tree.map(jnp.array, batch_stats), tx)
    step = make_train_step(model, tx, n_classes=args.n_classes,
                           mean=args.mean, std=args.std, donate=True)
    batch = {"x": jax.device_put(rng.integers(0, 255, (B, *hw, 3),
                                              dtype=np.uint8)),
             "coords": jax.device_put(np.stack(
                 [rng.integers(0, hw[0], (B, K)),
                  rng.integers(0, hw[1], (B, K))], -1).astype(np.int32)),
             "labels": jax.device_put(
                 rng.integers(0, args.n_classes, (B, K)).astype(np.int32)),
             "valid": jax.device_put(np.ones((B, K), bool))}

    def fn(i, s):
        return step(s, batch, jax.random.fold_in(key, i))[0]

    def drain(c):
        return np.asarray(jax.tree.leaves(c)[0]).ravel()[0]

    s = state
    for i in range(3):
        s = fn(1_000_000 + i, s)
    drain(s)
    times = []
    for w, N in enumerate((8, 40)):
        t0 = time.perf_counter()
        for i in range(N):
            s = fn(2_000_000 + 10_000 * w + i, s)
        drain(s)
        times.append(time.perf_counter() - t0)
    dt = (times[1] - times[0]) / 32
    print(json.dumps({"impl": args_cli.impl, "bs": B,
                      "ms_per_step": round(dt * 1e3, 2),
                      "imgs_per_sec": round(B / dt, 1)}))


if __name__ == "__main__":
    main()
