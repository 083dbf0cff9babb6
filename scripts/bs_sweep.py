"""Train-step batch-size sweep on the real chip.

Times the sparse-label train step with the honest protocol (see
bench.py:_timeit_chained): chained steps (each consumes the previous state)
AND a two-window slope where each window ends in a host fetch — through the
tunnel, ``block_until_ready`` returns at enqueue, so naive timings read
10-50x above the hardware's real speed. Also prints compiled FLOPs
(→ achieved TFLOPs; v5e bf16 peak is ~197) and the program's HBM footprint
from ``compiled.memory_analysis()``.

Usage: python scripts/bs_sweep.py [--bs 8 16 32 48 96] [--f32] [--donate]
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
    p.add_argument("--bs", type=int, nargs="+",
                   default=[8, 16, 24, 32, 40, 48, 56, 64])
    p.add_argument("--f32", action="store_true")
    p.add_argument("--hw", type=int, nargs=2, default=[360, 480])
    p.add_argument("--iters", type=int, default=40,
                   help="window-size delta for the two-window slope")
    p.add_argument("--donate", action="store_true")
    args_cli = p.parse_args()

    import jax

    from pixelpick_tpu.config import default_args, enable_compile_cache
    from pixelpick_tpu.engine.optim import make_optimizer
    from pixelpick_tpu.engine.trainer import create_train_state, make_train_step
    from pixelpick_tpu.models import get_model, init_model

    enable_compile_cache()
    hw = tuple(args_cli.hw)
    precision = "f32" if args_cli.f32 else "bf16"
    args = default_args("cv", write_files=False, precision=precision)
    model = get_model(args)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), hw)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    K = 128

    for B in args_cli.bs:
        tx = make_optimizer(args, params, iters_per_epoch=367 // B)
        # fresh device copies: with --donate the chained loop consumes the
        # state's buffers, which must not alias the template params
        import jax.numpy as jnp
        state = create_train_state(jax.tree.map(jnp.array, params),
                                   jax.tree.map(jnp.array, batch_stats), tx)
        step = make_train_step(model, tx, n_classes=args.n_classes,
                               mean=args.mean, std=args.std,
                               donate=args_cli.donate)
        batch = {
            "x": jax.device_put(rng.integers(0, 255, (B, *hw, 3),
                                             dtype=np.uint8)),
            "coords": jax.device_put(np.stack(
                [rng.integers(0, hw[0], (B, K)),
                 rng.integers(0, hw[1], (B, K))], -1).astype(np.int32)),
            "labels": jax.device_put(
                rng.integers(0, args.n_classes, (B, K)).astype(np.int32)),
            "valid": jax.device_put(np.ones((B, K), bool)),
        }

        # compile + memory analysis
        t0 = time.perf_counter()
        compiled = step.lower(state, batch, key).compile()
        compile_s = time.perf_counter() - t0
        try:
            m = compiled.memory_analysis()
            mem = {"peak_hbm_mb": round(getattr(m, "temp_size_in_bytes", 0)
                                        / 2**20, 1),
                   "args_mb": round(getattr(m, "argument_size_in_bytes", 0)
                                    / 2**20, 1),
                   "out_mb": round(getattr(m, "output_size_in_bytes", 0)
                                   / 2**20, 1),
                   "gen_mb": round(getattr(m, "generated_code_size_in_bytes",
                                           0) / 2**20, 1)}
        except Exception as e:
            mem = {"error": str(e)}

        try:
            flops = compiled.cost_analysis()["flops"]
        except Exception:
            flops = 0.0

        def chained(i, s):
            return step(s, batch, jax.random.fold_in(key, i))[0]

        def drain(s):
            # block_until_ready lies through the tunnel (returns at enqueue);
            # a host fetch of a state-dependent scalar forces real completion
            return np.asarray(jax.tree.leaves(s)[0]).ravel()[0]

        s = state
        for i in range(3):
            s = chained(1_000_000 + i, s)
        drain(s)
        # two-window slope cancels fixed dispatch/fetch overhead (bench.py
        # _timeit_chained: the honest methodology)
        times = []
        for w, N in enumerate((10, 10 + args_cli.iters)):
            t0 = time.perf_counter()
            for i in range(N):
                s = chained(2_000_000 + 10_000 * w + i, s)
            drain(s)
            times.append(time.perf_counter() - t0)
        dt = (times[1] - times[0]) / args_cli.iters
        print(json.dumps({"bs": B, "precision": precision,
                          "ms_per_step": round(dt * 1e3, 2),
                          "imgs_per_sec": round(B / dt, 1),
                          "achieved_tflops": round(flops / dt / 1e12, 1),
                          "compile_s": round(compile_s, 1),
                          "donate": args_cli.donate, **mem}), flush=True)


if __name__ == "__main__":
    main()
