"""Component-level TPU timing of the train step's pieces.

Times jitted sub-programs (backbone fwd, ASPP fwd, head fwd, head fwd+bwd,
full fwd, full train step) with the chained-slope protocol so enqueue
pipelining can't distort the numbers. The chain trick for pure tensor fns:
``x + 0.0 * prev_scalar`` — XLA does not fold float ``0*x`` (NaN/Inf
semantics), so each step truly depends on the previous one.

Usage: python scripts/perf_parts.py [--parts all]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")
from bench import _timeit_chained, _setup, _train_batch  # noqa: E402

B = 48
HW = (360, 480)


def _chain_time(fn, x0):
    """fn: x -> tensor. Chained by injecting a 0*scalar dependence."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(x, prev_scalar):
        out = fn(x + (0.0 * prev_scalar).astype(x.dtype))
        return jnp.sum(out[..., :1].astype(jnp.float32))

    def wrapped(i, carry):
        return step(x0, carry)

    carry0 = step(x0, jnp.float32(0.0))
    return _timeit_chained(wrapped, carry0)


def main():
    from pixelpick_tpu.config import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", type=str, default="all")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from pixelpick_tpu.models.mobilenet_v2 import MobileNetV2
    from pixelpick_tpu.models.aspp import ASPP
    from pixelpick_tpu.models.deeplab import SegmentHead

    args, model, params, batch_stats = _setup("bf16", HW, bn_group_size=4)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    results = {}
    want = a.parts.split(",") if a.parts != "all" else [
        "backbone_fwd", "aspp_fwd", "head_fwd", "head_train",
        "full_fwd", "backbone_train"]

    def report(name, sec, flops_g=None):
        r = {"ms_per_step": 1000 * sec, "ms_per_img": 1000 * sec / B}
        if flops_g:
            r["tflops"] = flops_g * B / sec / 1000
        results[name] = r
        print(name, json.dumps(r), flush=True)

    bb = MobileNetV2(mc_dropout=False, dtype=jnp.bfloat16, bn_groups=4)
    x_img = jnp.asarray(rng.standard_normal((B, *HW, 3)), jnp.bfloat16)
    vb = bb.init({"params": key}, x_img[:1], train=True)

    if "backbone_fwd" in want:
        sec = _chain_time(
            lambda x: bb.apply(vb, x, train=False)[0], x_img)
        report("backbone_fwd", sec, flops_g=1.0)

    if "backbone_train" in want:
        # xla_nowgrad: the depthwise WGRAD convs hit an XLA-TPU
        # batch_group_count compile rejection when traced standalone; the
        # full-model diff puts their cost at ~6.5 ms/step anyway (probe
        # 'nodwgrad'), so measure everything else here and add that.
        import pixelpick_tpu.models.layers as layers

        layers.set_depthwise_impl("xla_nowgrad")
        try:
            bb2 = MobileNetV2(mc_dropout=False, dtype=jnp.bfloat16,
                              bn_groups=4)
            vb2 = bb2.init({"params": key}, x_img[:1], train=True)

            def bb_loss(p, x):
                (h, l), mut = bb2.apply({"params": p}, x, train=True,
                                        mutable=["batch_stats"])
                return jnp.sum(jnp.square(h.astype(jnp.float32))) \
                    + jnp.sum(jnp.square(l.astype(jnp.float32)))

            grad_fn = jax.grad(bb_loss)

            @jax.jit
            def step(x, prev):
                g = grad_fn(vb2["params"], x + (0.0 * prev).astype(x.dtype))
                return sum(jnp.sum(l.astype(jnp.float32))
                           for l in jax.tree.leaves(g))

            carry0 = step(x_img, jnp.float32(0))
            sec = _timeit_chained(lambda i, c: step(x_img, c), carry0)
            report("backbone_train_nodwgrad", sec, flops_g=3.0)
        finally:
            layers.set_depthwise_impl("xla")

    h16 = (HW[0] // 16, HW[1] // 16)
    x_high = jnp.asarray(rng.standard_normal((B, *h16, 320)), jnp.bfloat16)
    aspp = ASPP(dtype=jnp.bfloat16, bn_groups=4)
    va = aspp.init({"params": key, "dropout": key}, x_high[:1], train=True)

    if "aspp_fwd" in want:
        sec = _chain_time(lambda x: aspp.apply(va, x, train=False), x_high)
        report("aspp_fwd", sec, flops_g=3.6)

    if "aspp_train" in want:
        def aspp_loss(p, x, k):
            out, mut = aspp.apply({"params": p}, x, train=True,
                                  mutable=["batch_stats"],
                                  rngs={"dropout": k})
            return jnp.sum(jnp.square(out.astype(jnp.float32)))

        gaspp = jax.jit(jax.grad(aspp_loss, argnums=(0, 1)))

        @jax.jit
        def astep(x, prev):
            g = gaspp(va["params"], x + (0.0 * prev).astype(x.dtype), key)
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree.leaves(g))

        carry0 = astep(x_high, jnp.float32(0))
        sec = _timeit_chained(lambda i, c: astep(x_high, c), carry0)
        report("aspp_train", sec, flops_g=3.6 * 3)

    h4 = (HW[0] // 4, HW[1] // 4)
    x_head = jnp.asarray(rng.standard_normal((B, *h4, 304)), jnp.bfloat16)
    head = SegmentHead(n_classes=11, dtype=jnp.bfloat16, bn_groups=4)
    vh = head.init({"params": key, "dropout": key}, x_head[:1], train=True)

    if "head_fwd" in want:
        sec = _chain_time(
            lambda x: head.apply(vh, x, train=False)[1], x_head)
        report("head_fwd", sec, flops_g=27.9)

    if "head_train" in want:
        def head_loss(p, x, k):
            (emb, pred), mut = head.apply(
                {"params": p}, x, train=True, mutable=["batch_stats"],
                rngs={"dropout": k})
            # square: non-degenerate cotangent (sum's ones-cotangent lets
            # XLA algebraically collapse the backward)
            return jnp.sum(jnp.square(pred.astype(jnp.float32)))

        # grads w.r.t. params AND input — the real step backprops through
        # the head into the backbone, so conv1's dgrad must be counted
        ghead = jax.jit(jax.grad(head_loss, argnums=(0, 1)))

        @jax.jit
        def step(x, prev):
            g = ghead(vh["params"], x + (0.0 * prev).astype(x.dtype), key)
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree.leaves(g))

        carry0 = step(x_head, jnp.float32(0))
        sec = _timeit_chained(lambda i, c: step(x_head, c), carry0)
        report("head_train", sec, flops_g=27.9 * 3)

    if "train_sumloss" in want or "train_sqloss" in want \
            or "train_gatherloss" in want:
        x_u8 = jnp.asarray(rng.integers(0, 255, (B, *HW, 3)), jnp.uint8)

        def make_probe(loss_of_out):
            def loss_fn(p, x, k):
                out, mut = model.apply(
                    {"params": p, "batch_stats": batch_stats}, x,
                    train=True, upsample=False, rngs={"dropout": k},
                    mutable=["batch_stats"])
                return loss_of_out(out, x)

            gfn = jax.grad(loss_fn)

            @jax.jit
            def step(x, prev):
                xx = (x.astype(jnp.float32) + 0.0 * prev) / 255.0
                g = gfn(params, xx, key)
                # consume EVERY grad leaf — anything unread is dead code to
                # XLA and its wgrad chain silently vanishes from the timing
                return sum(jnp.sum(l.astype(jnp.float32))
                           for l in jax.tree.leaves(g))

            carry0 = step(x_u8, jnp.float32(0))
            return _timeit_chained(lambda i, c: step(x_u8, c), carry0)

        if "train_sumloss" in want:
            # WARNING: d(sum)/dpred == ones lets XLA simplify the backward
            # algebraically — reads ~2x faster than any real loss. Kept only
            # to demonstrate the trap.
            report("train_sumloss", make_probe(
                lambda out, x: jnp.sum(out["pred"].astype(jnp.float32))),
                flops_g=32.5 * 3)
        if "train_sqloss" in want:
            # non-degenerate cotangent: the honest model fwd+bwd cost
            report("train_sqloss", make_probe(
                lambda out, x: jnp.sum(
                    jnp.square(out["pred"].astype(jnp.float32)))),
                flops_g=32.5 * 3)
        if "train_gatherloss" in want:
            from pixelpick_tpu.engine.trainer import sparse_ce_and_hist

            batch_g = _train_batch(rng, B, HW, args.n_classes)

            def gather_loss(out, x):
                loss, hist = sparse_ce_and_hist(
                    out["pred"], batch_g["coords"], batch_g["labels"],
                    batch_g["valid"], HW, args.n_classes)
                return loss

            report("train_gatherloss", make_probe(gather_loss),
                   flops_g=32.5 * 3)

    if "train_ref" in want:
        import jax as _jax
        from pixelpick_tpu.engine.optim import make_optimizer
        from pixelpick_tpu.engine.trainer import (
            create_train_state, make_train_step)

        tx = make_optimizer(args, params, iters_per_epoch=100)
        state = create_train_state(jax.tree.map(jnp.array, params),
                                   jax.tree.map(jnp.array, batch_stats), tx)
        step = make_train_step(model, tx, n_classes=args.n_classes,
                               mean=args.mean, std=args.std, donate=True)
        batch = _train_batch(rng, B, HW, args.n_classes)
        sec = _timeit_chained(
            lambda i, s: step(s, batch, _jax.random.fold_in(key, i))[0],
            state)
        report("train_ref", sec, flops_g=32.5 * 3)

    if "matmul_peak" in want:
        # empirical MXU ceiling through this stack: chained 4096^3 bf16
        # matmuls (no conv, no BN) — the denominator every MFU% here uses
        a0 = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
        b0 = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)

        @jax.jit
        def mmstep(prev):
            a = a0 + (0.0 * prev).astype(a0.dtype)
            c = a @ b0
            return jnp.sum(c[..., :1].astype(jnp.float32))

        carry0 = mmstep(jnp.float32(0))
        sec = _timeit_chained(lambda i, c: mmstep(c), carry0)
        tf = 2 * 4096**3 / sec / 1e12
        results["matmul_peak"] = {"ms": 1000 * sec, "tflops": tf}
        print("matmul_peak", json.dumps(results["matmul_peak"]), flush=True)

    if "headconvs_fwd" in want or "headconvs_train" in want:
        # the two 3x3 head convs ALONE (relu between, no BN/dropout):
        # isolates raw conv cost; head_train minus this = BN+dropout+
        # elementwise share
        from jax import lax

        k1 = jnp.asarray(rng.standard_normal((3, 3, 304, 256)) * 0.05,
                         jnp.bfloat16)
        k2 = jnp.asarray(rng.standard_normal((3, 3, 256, 256)) * 0.05,
                         jnp.bfloat16)
        xh = jnp.asarray(rng.standard_normal((B, *h4, 304)), jnp.bfloat16)

        def two_convs(x, kk1, kk2):
            y = lax.conv_general_dilated(
                x, kk1, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = jnp.maximum(y, 0)
            return lax.conv_general_dilated(
                y, kk2, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        gflops = (9 * 304 * 256 + 9 * 256 * 256) * 2 * h4[0] * h4[1] / 1e9

        if "headconvs_fwd" in want:
            sec = _chain_time(lambda x: two_convs(x, k1, k2), xh)
            report("headconvs_fwd", sec, flops_g=gflops)

        if "headconvs_train" in want:
            gfn = jax.grad(
                lambda ks, x: jnp.sum(
                    jnp.square(two_convs(x, *ks).astype(jnp.float32))),
                argnums=(0, 1))

            @jax.jit
            def cstep(x, prev):
                gks, gx = gfn((k1, k2), x + (0.0 * prev).astype(x.dtype))
                return sum(jnp.sum(l.astype(jnp.float32))
                           for l in jax.tree.leaves((gks, gx)))

            carry0 = cstep(xh, jnp.float32(0))
            sec = _timeit_chained(lambda i, c: cstep(xh, c), carry0)
            report("headconvs_train", sec, flops_g=3 * gflops)

    if any(p.startswith("stem") for p in want):
        # Input-layout tax: the (B,360,480,3) batch is lane-padded 3->128 in
        # HBM (~2.65 GB uint8 / 5.3 GB bf16 physical vs 132 MB logical), and
        # the stem conv + its wgrad read it. The s2d variants feed the SAME
        # pixels as (B,180,240,12) (2x2 space-to-depth, phase-major), whose
        # pad 12->128 is 10x cheaper; the stem becomes an exact 2x2-cell
        # conv producing the identical (B,180,240,32) output.
        from jax import lax
        mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
        std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
        k_stem = jnp.asarray(rng.standard_normal((3, 3, 3, 32)) * 0.1,
                             jnp.bfloat16)

        def stem_plain(x_u8, k):
            xx = (x_u8.astype(jnp.float32) / 255.0 - mean) / std
            return lax.conv_general_dilated(
                xx.astype(jnp.bfloat16), k, (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        # s2d kernel map: ky -> (cell offset a, phase py): 0->(0,1),
        # 1->(1,0), 2->(1,1); (a,py)=(0,0) taps nothing (zero)
        def k_to_s2d(k):
            rows = {(0, 1): 0, (1, 0): 1, (1, 1): 2}
            # K2[a,bx,(py*2+px)*3+c,o] = k[ky(a,py), kx(bx,px), c, o]
            K2 = jnp.zeros((2, 2, 12, k.shape[-1]), k.dtype)
            for a in range(2):
                for py in range(2):
                    ky = rows.get((a, py))
                    if ky is None:
                        continue
                    for b_ in range(2):
                        for px in range(2):
                            kx = rows.get((b_, px))
                            if kx is None:
                                continue
                            p = py * 2 + px
                            K2 = K2.at[a, b_, p * 3:(p + 1) * 3, :].set(
                                k[ky, kx])
            return K2

        def stem_s2d(x_u8_s2d, k):
            m4 = jnp.concatenate([mean] * 4)
            s4 = jnp.concatenate([std] * 4)
            xx = (x_u8_s2d.astype(jnp.float32) / 255.0 - m4) / s4
            return lax.conv_general_dilated(
                xx.astype(jnp.bfloat16), k_to_s2d(k), (1, 1),
                ((1, 0), (1, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        x_u8 = jnp.asarray(rng.integers(0, 255, (B, *HW, 3)), jnp.uint8)
        xs = np.asarray(x_u8).reshape(B, HW[0] // 2, 2, HW[1] // 2, 2, 3)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, HW[0] // 2,
                                                    HW[1] // 2, 12)
        x_u8_s2d = jnp.asarray(xs)

        if "stem_check" in want:
            a_ = np.asarray(stem_plain(x_u8, k_stem), np.float32)
            b2 = np.asarray(stem_s2d(x_u8_s2d, k_stem), np.float32)
            err = float(np.abs(a_ - b2).max())
            results["stem_check"] = {"max_abs_err": err}
            print("stem_check", json.dumps(results["stem_check"]), flush=True)

        if "stem_fwd" in want:
            sec = _chain_time(lambda x: stem_plain(x, k_stem), x_u8)
            report("stem_fwd", sec)
        if "stem_s2d_fwd" in want:
            sec = _chain_time(lambda x: stem_s2d(x, k_stem), x_u8_s2d)
            report("stem_s2d_fwd", sec)

        def train_probe(stem_fn, x0):
            gfn = jax.grad(lambda k, x: jnp.sum(
                jnp.square(stem_fn(x, k).astype(jnp.float32))))

            @jax.jit
            def tstep(x, prev):
                g = gfn(k_stem + (0.0 * prev).astype(k_stem.dtype), x)
                return jnp.sum(g.astype(jnp.float32))

            carry0 = tstep(x0, jnp.float32(0))
            return _timeit_chained(lambda i, c: tstep(x0, c), carry0)

        if "stem_train" in want:
            report("stem_train", train_probe(stem_plain, x_u8))
        if "stem_s2d_train" in want:
            report("stem_s2d_train", train_probe(stem_s2d, x_u8_s2d))

    if "full_fwd" in want:
        x_u8 = jnp.asarray(rng.integers(0, 255, (B, *HW, 3)), jnp.uint8)

        @jax.jit
        def fwd(x, prev):
            xx = x.astype(jnp.float32) + 0.0 * prev
            out = model.apply({"params": params, "batch_stats": batch_stats},
                              xx / 255.0, train=False, upsample=False)
            return jnp.sum(out["pred"].astype(jnp.float32))

        carry0 = fwd(x_u8, jnp.float32(0))
        sec = _timeit_chained(lambda i, c: fwd(x_u8, c), carry0)
        report("full_fwd", sec, flops_g=32.5)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
