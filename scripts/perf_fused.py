"""Measure the fused inverted-residual kernel against its HBM roofline.

The experiment PERF.md calls for: a *measured* %-of-roofline datapoint for
whole-block fusion, at the real backbone shapes (CamVid 360x480 input,
bf16, bs48, ghost-BN group 4). For each probed block shape this times, with
the honest chained-slope protocol (bench._timeit_chained):

- ``fused``  — fwd+bwd through ops/fused_ir.py (one VMEM-resident BN group
  per grid program; backward recomputed in-kernel),
- ``xla``    — the identical subgraph through the unfused InvertedResidual
  module (XLA's own fusion),

and reports two rooflines at 819 GB/s HBM:

- ``ideal_fused_ms``   — only the thin chain boundary moves: read x (fwd),
  write y, read y+write dy (the probe's loss grad), read x + dy, write dx.
- ``ideal_unfused_ms`` — every conv reads its input and writes its output,
  fwd and bwd (the PERF.md analytic model that XLA was measured at 34-48%
  of).

CAVEAT (measured, round 4): at sub-ms kernel sizes these isolated
single-block probes are dominated by per-step dispatch through the
tunnelled backend — they showed the fused kernel 2.17x faster than XLA
at b7 while the FULL-STEP measurement (scripts/perf_probe.py --variants
base,fused) shows fusion is net-negative (113.5 vs 108.1 ms). Use the
full-step number; this probe remains for kernel-relative iteration only.

Usage: python scripts/perf_fused.py [--blocks b7,b11,b14,b4]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")
from bench import _timeit_chained  # noqa: E402

HBM_GBPS = 819.0

# (name, H, W, Cin, t, Cout, dilation) — backbone block shapes at 360x480
# input (models/mobilenet_v2.py block_plan; PERF.md traffic table)
BLOCKS = {
    "b2": ("block 2: 24ch @ 90x120", 90, 120, 24, 6, 24, 1),
    "b4": ("blocks 4-5: 32ch @ 45x60", 45, 60, 32, 6, 32, 1),
    "b7": ("blocks 7-9: 64ch @ 23x30", 23, 30, 64, 6, 64, 1),
    "b11": ("blocks 11-12: 96ch @ 23x30", 23, 30, 96, 6, 96, 1),
    "b14": ("blocks 14-15: 160ch @ 23x30", 23, 30, 160, 6, 160, 1),
    "b16": ("block 16: 160->320 d2 @ 23x30", 23, 30, 160, 6, 320, 2),
}

B, GROUP = 48, 4


def probe(name, h, w, ci, t, co, dilation, batch=B, group=GROUP):
    import jax
    import jax.numpy as jnp

    from pixelpick_tpu.models.fused_block import (
        FUSED_VMEM_BUDGET, FusedIRBlock,
    )
    from pixelpick_tpu.models.mobilenet_v2 import InvertedResidual
    from pixelpick_tpu.ops.fused_ir import vmem_estimate_bytes

    dtype = jnp.bfloat16
    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, h, w, ci),
                           jnp.float32).astype(dtype)
    fused = FusedIRBlock(ci, co, 1, dilation, t, dtype=dtype,
                         bn_groups=group)
    ref = InvertedResidual(ci, co, 1, dilation, t, dtype=dtype,
                           bn_groups=group)
    v = ref.init(jax.random.PRNGKey(0), x0, train=False)
    est = vmem_estimate_bytes(group, h, w, ci, ci * t, co, dilation, 2)

    def make_step(mod):
        def f(x):
            out, _ = mod.apply(v, x, train=True, mutable=["batch_stats"])
            return (out.astype(jnp.float32) ** 2).sum()

        @jax.jit
        def step(x):
            dx = jax.grad(f)(x)
            return (x - jnp.asarray(1e-4, dtype) * dx).astype(dtype)

        return step

    res = {"shape": f"({batch},{h},{w},{ci})->t{t}->{co} d{dilation}",
           "vmem_est_mb": round(est / 2**20, 2),
           "vmem_eligible": est <= FUSED_VMEM_BUDGET}
    itemsize = 2
    # fused ideal: x read twice (fwd, bwd) + x read/write by the probe's
    # sgd update, y write + read, dy write + read, dx write
    nio = batch * h * w * itemsize
    res["ideal_fused_ms"] = 1e3 * nio * (4 * ci + 2 * co + 2 * co + ci) \
        / (HBM_GBPS * 1e9)
    # unfused ideal: per-conv read+write, fwd + ~2.9x bwd (PERF.md model)
    ch = ci * t
    hp, wp = h + 2 * dilation, w + 2 * dilation
    fwd_bytes = itemsize * batch * (
        hp * wp * (ci + ch)          # pad read + expand write
        + hp * wp * ch + h * w * ch  # dw read + write
        + h * w * (ch + co)          # project read + write
        + h * w * (ci + co))         # residual read + y write
    res["ideal_unfused_ms"] = 1e3 * fwd_bytes * 3.7 / (HBM_GBPS * 1e9)

    for label, mod in (("fused", fused), ("xla", ref)):
        step = make_step(mod)
        sec = _timeit_chained(lambda i, x: step(x), x0)
        res[f"{label}_ms"] = 1e3 * sec
    res["speedup"] = res["xla_ms"] / res["fused_ms"]
    res["fused_pct_of_roofline"] = 100 * res["ideal_fused_ms"] \
        / res["fused_ms"]
    res["xla_pct_of_unfused_roofline"] = 100 * res["ideal_unfused_ms"] \
        / res["xla_ms"]
    return res


def main():
    from pixelpick_tpu.config import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=str, default="b7,b11,b14")
    ap.add_argument("--batch", type=int, default=B)
    a = ap.parse_args()
    out = {}
    for key in a.blocks.split(","):
        desc, h, w, ci, t, co, d = BLOCKS[key]
        out[key] = probe(desc, h, w, ci, t, co, d, batch=a.batch)
        print(key, desc, json.dumps(out[key]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
