"""Per-stage MobileNetV2 cost attribution on TPU.

Times fwd+bwd (square loss, all grads + input grad consumed) of block
ranges from the os-16 block plan at their true activation shapes, bs48.
Stage boundaries:
  stem            (48, 360, 480, 3)   -> (180, 240, 32)
  blocks 0..2     (180, 240, 32)      -> (90, 120, 24)
  blocks 3..5     (90, 120, 24)       -> (45, 60, 32)
  blocks 6..16    (45, 60, 32)        -> (23, 30, 320)

Usage: python scripts/perf_backbone.py [--stages stem,early,mid,late]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")
from bench import _timeit_chained  # noqa: E402

B = 48


def time_blocks(lo, hi, in_hw, in_ch, bn_groups=4):
    """fwd+bwd of blocks [lo, hi) from the os-16 plan."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from pixelpick_tpu.models.mobilenet_v2 import InvertedResidual, block_plan
    import pixelpick_tpu.models.layers as layers

    plan, _ = block_plan(16)

    class Stage(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            for i in range(lo, hi):
                inp, oup, stride, dilation, t = plan[i]
                x = InvertedResidual(inp, oup, stride, dilation, t,
                                     dtype=jnp.bfloat16, bn_groups=bn_groups,
                                     name=f"block_{i}")(x, train)
            return x

    layers.set_depthwise_impl("xla_nowgrad")
    try:
        m = Stage()
        key = jax.random.PRNGKey(0)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, *in_hw, in_ch)), jnp.bfloat16)
        v = m.init({"params": key}, x[:1])

        def loss(p, xx):
            out, mut = m.apply({"params": p}, xx, train=True,
                               mutable=["batch_stats"])
            return jnp.sum(jnp.square(out.astype(jnp.float32)))

        gfn = jax.grad(loss, argnums=(0, 1))

        @jax.jit
        def step(xx, prev):
            g, gx = gfn(v["params"], xx + (0.0 * prev).astype(xx.dtype))
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree.leaves(g)) \
                + jnp.sum(gx.astype(jnp.float32))

        carry0 = step(x, jnp.float32(0))
        sec = _timeit_chained(lambda i, c: step(x, c), carry0)
        return {"ms_per_step": 1000 * sec, "ms_per_img": 1000 * sec / B}
    finally:
        layers.set_depthwise_impl("xla")


def time_stem(bn_groups=4):
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from pixelpick_tpu.models.layers import TorchBatchNorm, conv, relu6

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            h = conv(32, (3, 3), 2, padding=1, dtype=jnp.bfloat16,
                     name="stem")(x)
            h = TorchBatchNorm(jnp.bfloat16, bn_groups, name="bn")(h, train)
            return relu6(h)

    m = Stem()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 360, 480, 3)), jnp.bfloat16)
    v = m.init({"params": jax.random.PRNGKey(0)}, x[:1])

    def loss(p, xx):
        out, mut = m.apply({"params": p}, xx, train=True,
                           mutable=["batch_stats"])
        return jnp.sum(jnp.square(out.astype(jnp.float32)))

    gfn = jax.grad(loss)
    import jax as _j

    @_j.jit
    def step(xx, prev):
        g = gfn(v["params"], xx + (0.0 * prev).astype(xx.dtype))
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree.leaves(g))

    carry0 = step(x, jnp.float32(0))
    sec = _timeit_chained(lambda i, c: step(x, c), carry0)
    return {"ms_per_step": 1000 * sec, "ms_per_img": 1000 * sec / B}


def time_blocks_fwd(lo, hi, in_hw, in_ch, bn_groups=4):
    """forward-only of blocks [lo, hi)."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from pixelpick_tpu.models.mobilenet_v2 import InvertedResidual, block_plan

    plan, _ = block_plan(16)

    class Stage(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            for i in range(lo, hi):
                inp, oup, stride, dilation, t = plan[i]
                x = InvertedResidual(inp, oup, stride, dilation, t,
                                     dtype=jnp.bfloat16, bn_groups=bn_groups,
                                     name=f"block_{i}")(x, train)
            return x

    m = Stage()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, *in_hw, in_ch)), jnp.bfloat16)
    v = m.init({"params": jax.random.PRNGKey(0)}, x[:1], train=True)

    @jax.jit
    def step(xx, prev):
        out = m.apply({"params": v["params"],
                       "batch_stats": v.get("batch_stats", {})},
                      xx + (0.0 * prev).astype(xx.dtype), train=False)
        return jnp.sum(out.astype(jnp.float32))

    carry0 = step(x, jnp.float32(0))
    sec = _timeit_chained(lambda i, c: step(x, c), carry0)
    return {"ms_per_step": 1000 * sec, "ms_per_img": 1000 * sec / B}


STAGES = {
    "stem": lambda: time_stem(),
    "early": lambda: time_blocks(0, 3, (180, 240), 32),
    "mid": lambda: time_blocks(3, 6, (90, 120), 24),
    "late": lambda: time_blocks(6, 17, (45, 60), 32),
    "b0": lambda: time_blocks(0, 1, (180, 240), 32),
    "b1": lambda: time_blocks(1, 2, (180, 240), 16),
    "b2": lambda: time_blocks(2, 3, (90, 120), 24),
    "b0_fwd": lambda: time_blocks_fwd(0, 1, (180, 240), 32),
    "b1_fwd": lambda: time_blocks_fwd(1, 2, (180, 240), 16),
    "early_fwd": lambda: time_blocks_fwd(0, 3, (180, 240), 32),
}


def main():
    from pixelpick_tpu.config import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", type=str, default="stem,early,mid,late")
    a = ap.parse_args()
    out = {}
    for s in a.stages.split(","):
        out[s] = STAGES[s]()
        print(s, json.dumps(out[s]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
