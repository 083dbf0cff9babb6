"""Where does the train step's time go? Honest per-component timing.

Times, with the artifact-proof protocol (chained data dependence + two-window
slope, each window drained by a host fetch — see bench.py:_timeit_chained),
at the production config (bf16, 360x480):

- full sparse train step (fwd + loss + bwd + optax + BN stats)
- forward only, os-native logits (upsample=False)
- forward only, full-res logits (upsample=True, eval path)
- backbone (MobileNetV2) forward only
- sparse-CE loss + grad wrt logits only (the separable one-hot matmuls)
- one depthwise 3x3 at the widest early shape, xla vs pallas impls

Usage: python scripts/profile_breakdown.py [--bs 48]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, carry, windows=(8, 32)):
    import jax

    def drain(c):
        return np.asarray(jax.tree.leaves(c)[0]).ravel()[0]

    for i in range(3):
        carry = fn(1_000_000 + i, carry)
    drain(carry)
    times = []
    for w, N in enumerate(windows):
        t0 = time.perf_counter()
        for i in range(N):
            carry = fn(2_000_000 + 10_000 * w + i, carry)
        drain(carry)
        times.append(time.perf_counter() - t0)
    return (times[-1] - times[0]) / (windows[-1] - windows[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=48)
    p.add_argument("--hw", type=int, nargs=2, default=[360, 480])
    args_cli = p.parse_args()

    import jax
    import jax.numpy as jnp

    from pixelpick_tpu.config import default_args, enable_compile_cache
    from pixelpick_tpu.engine.optim import make_optimizer
    from pixelpick_tpu.engine.trainer import (
        create_train_state, make_train_step, sparse_ce_and_hist)
    from pixelpick_tpu.models import get_model, init_model
    from pixelpick_tpu.models.mobilenet_v2 import MobileNetV2

    enable_compile_cache()
    B = args_cli.bs
    hw = tuple(args_cli.hw)
    K = 128
    args = default_args("cv", write_files=False, precision="bf16")
    model = get_model(args)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), hw)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jax.device_put(
        ((rng.random((B, *hw, 3)) - 0.45) / 0.28).astype(np.float32))
    out = {}

    def dep(x, c):
        # preserve a data dependence on the previous result without
        # changing the value (1e-30 underflows the ulp at these magnitudes)
        return x * (1 + c.astype(x.dtype) * 1e-30)

    # ---- full train step
    tx = make_optimizer(args, params, iters_per_epoch=367 // B)
    state = create_train_state(jax.tree.map(jnp.array, params),
                               jax.tree.map(jnp.array, batch_stats), tx)
    step = make_train_step(model, tx, n_classes=args.n_classes,
                           mean=args.mean, std=args.std, donate=True,
                           normalize=False)
    batch = {"x": x,
             "coords": jax.device_put(np.stack(
                 [rng.integers(0, hw[0], (B, K)),
                  rng.integers(0, hw[1], (B, K))], -1).astype(np.int32)),
             "labels": jax.device_put(
                 rng.integers(0, args.n_classes, (B, K)).astype(np.int32)),
             "valid": jax.device_put(np.ones((B, K), bool))}
    dt = timeit(lambda i, s: step(s, batch, jax.random.fold_in(key, i))[0],
                state)
    out["train_step"] = dt
    print("train_step", round(dt * 1e3, 2), flush=True)

    # ---- forwards
    @jax.jit
    def fwd_os(params, batch_stats, x, c):
        o = model.apply({"params": params, "batch_stats": batch_stats},
                        dep(x, c), train=False, upsample=False)
        return jnp.mean(o["pred"].astype(jnp.float32))

    @jax.jit
    def fwd_full(params, batch_stats, x, c):
        o = model.apply({"params": params, "batch_stats": batch_stats},
                        dep(x, c), train=False, upsample=True)
        return jnp.mean(o["pred"].astype(jnp.float32))

    c0 = jnp.zeros(())
    out["fwd_os"] = timeit(lambda i, c: fwd_os(params, batch_stats, x, c), c0)
    print("fwd_os", round(out["fwd_os"] * 1e3, 2), flush=True)
    out["fwd_fullres"] = timeit(
        lambda i, c: fwd_full(params, batch_stats, x, c), c0)
    print("fwd_fullres", round(out["fwd_fullres"] * 1e3, 2), flush=True)

    # ---- backbone only
    bb = MobileNetV2(dtype=jnp.bfloat16, output_stride=16)
    bb_params = params["backbone"]
    bb_stats = batch_stats["backbone"]

    @jax.jit
    def fwd_bb(p, s, x, c):
        o = bb.apply({"params": p, "batch_stats": s}, dep(x, c), train=False)
        return jnp.mean(o[-1].astype(jnp.float32))

    try:
        out["fwd_backbone"] = timeit(
            lambda i, c: fwd_bb(bb_params, bb_stats, x, c), c0)
    except Exception as e:
        out["fwd_backbone_error"] = str(e)[:120]

    # ---- sparse loss + grad wrt logits (decoder-output shape, os=4)
    oh, ow = hw[0] // 4, hw[1] // 4
    logits = jax.device_put(rng.standard_normal(
        (B, oh, ow, args.n_classes)).astype(np.float32))

    def loss_fn(lg):
        loss, _ = sparse_ce_and_hist(lg, batch["coords"], batch["labels"],
                                     batch["valid"], hw, args.n_classes)
        return loss

    gf = jax.jit(jax.value_and_grad(lambda lg, c: loss_fn(dep(lg, c))))
    out["loss_grad_os4"] = timeit(lambda i, c: gf(logits, c)[0], c0)

    # ---- depthwise micro (widest early shape: 180x240x96, stride 2)
    from pixelpick_tpu.ops.depthwise import depthwise_conv3x3
    from jax import lax
    xd = jax.device_put(rng.standard_normal(
        (B, 182, 242, 96)).astype(np.float32).astype(jnp.bfloat16))
    wd = jax.device_put(rng.standard_normal((3, 3, 96)).astype(np.float32)
                        .astype(jnp.bfloat16))
    wg = jax.device_put(np.transpose(
        np.asarray(wd, np.float32), (0, 1, 2))[:, :, None, :]
        .astype(jnp.bfloat16))  # (3,3,1,C) grouped form

    @jax.jit
    def dw_xla(x, c):
        y = lax.conv_general_dilated(
            dep(x, c), wg, (2, 2), "VALID", feature_group_count=96,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.mean(y.astype(jnp.float32))

    @jax.jit
    def dw_pallas(x, c):
        y = depthwise_conv3x3(dep(x, c), wd, 2, 1, 0, False)
        return jnp.mean(y.astype(jnp.float32))

    out["dw_xla_180x240x96_s2"] = timeit(lambda i, c: dw_xla(xd, c), c0)
    try:
        out["dw_pallas_180x240x96_s2"] = timeit(
            lambda i, c: dw_pallas(xd, c), c0)
    except Exception as e:
        out["dw_pallas_error"] = str(e)[:120]


    # ---- phase 2: where does the backward go?
    def mean_loss(p, bs, xx):
        o = model.apply({"params": p, "batch_stats": bs}, xx,
                        train=False, upsample=False)
        return jnp.mean(o["pred"].astype(jnp.float32))

    gfull = jax.jit(jax.grad(lambda p, bs, xx, c: mean_loss(p, bs, dep(xx, c))))

    def carry_scalar(tree):
        return jax.tree.leaves(tree)[0].ravel()[0]

    out["grad_full_evalbn"] = timeit(
        lambda i, c: carry_scalar(gfull(params, batch_stats, x, c)), c0,
        windows=(6, 24))
    print("grad_full_evalbn", round(out["grad_full_evalbn"] * 1e3, 2), flush=True)

    @jax.jit
    def fwd_trainbn(p, bs, xx, c):
        o, mut = model.apply({"params": p, "batch_stats": bs}, dep(xx, c),
                             train=True, upsample=False,
                             rngs={"dropout": jax.random.PRNGKey(0)},
                             mutable=["batch_stats"])
        # keep the BN-stat outputs live (tiny non-zero factor defeats DCE)
        keep = sum(l.astype(jnp.float32).ravel()[0]
                   for l in jax.tree.leaves(mut)) * 1e-30
        return jnp.mean(o["pred"].astype(jnp.float32)) + keep

    out["fwd_trainbn"] = timeit(
        lambda i, c: fwd_trainbn(params, batch_stats, x, c), c0)
    print("fwd_trainbn", round(out["fwd_trainbn"] * 1e3, 2), flush=True)

    gbb = jax.jit(jax.grad(lambda p, xx, c: jnp.mean(bb.apply(
        {"params": p, "batch_stats": bb_stats}, dep(xx, c),
        train=False)[-1].astype(jnp.float32))))
    out["grad_backbone"] = timeit(
        lambda i, c: carry_scalar(gbb(bb_params, x, c)), c0,
        windows=(6, 24))
    print("grad_backbone", round(out["grad_backbone"] * 1e3, 2), flush=True)

    def dw_xla_w(x, w, c):
        y = lax.conv_general_dilated(
            dep(x, c), w, (2, 2), "VALID", feature_group_count=96,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.mean(y.astype(jnp.float32))

    gdwx = jax.jit(jax.grad(lambda xx, c: dw_xla_w(xx, wg, c)))
    out["dw_xla_bwd_dx"] = timeit(lambda i, c: carry_scalar(gdwx(xd, c)), c0)
    print("dw_xla_bwd_dx", round(out["dw_xla_bwd_dx"] * 1e3, 2), flush=True)

    print(json.dumps({k: (round(v * 1e3, 2) if isinstance(v, float) else v)
                      for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
