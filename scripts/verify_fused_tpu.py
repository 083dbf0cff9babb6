"""Verify the fused inverted-residual kernel numerically on real TPU.

The CPU suite exercises ops/fused_ir.py in Pallas interpret mode
(tests/test_fused_ir.py); this script is the hardware half: it runs the
real Mosaic kernels at a production block shape (bs48, 23x30, 64ch, ghost
BN group 4, bf16 — the b7 class from scripts/perf_fused.py) and checks
loss and input-gradient norm against the unfused InvertedResidual module
compiled by XLA on the same chip.

Round-4 measured result: rel diff ~2e-5 on both (bf16 reduction-order
noise), i.e. the fused kernel is numerically interchangeable with the
XLA path on hardware.

Usage: python scripts/verify_fused_tpu.py  (TPU; first compile ~5-10 min)
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pixelpick_tpu.config import enable_compile_cache

B, H, W, CI, CO, T, D, G = 48, 23, 30, 64, 64, 6, 1, 4
RTOL = 5e-4


def main():
    enable_compile_cache()
    from pixelpick_tpu.models.fused_block import FusedIRBlock
    from pixelpick_tpu.models.mobilenet_v2 import InvertedResidual

    dtype = jnp.bfloat16
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, CI),
                          jnp.float32).astype(dtype)
    fused = FusedIRBlock(CI, CO, 1, D, T, dtype=dtype, bn_groups=G)
    ref = InvertedResidual(CI, CO, 1, D, T, dtype=dtype, bn_groups=G)
    v = ref.init(jax.random.PRNGKey(0), x, train=False)

    def loss_and_grad(mod):
        def f(xx):
            out, _ = mod.apply(v, xx, train=True, mutable=["batch_stats"])
            return (out.astype(jnp.float32) ** 2).sum()

        return jax.jit(jax.value_and_grad(f))

    out = {}
    for label, mod in (("fused", fused), ("xla", ref)):
        t0 = time.time()
        val, grad = loss_and_grad(mod)(x)
        out[label] = (float(val),
                      float(jnp.linalg.norm(grad.astype(jnp.float32))))
        print(f"{label}: compiled+ran in {time.time() - t0:.1f}s "
              f"loss={out[label][0]:.4f} |dx|={out[label][1]:.4f}",
              flush=True)
    rl = abs(out["fused"][0] - out["xla"][0]) / abs(out["xla"][0])
    rg = abs(out["fused"][1] - out["xla"][1]) / out["xla"][1]
    print(f"rel loss diff {rl:.2e}  rel |dx| diff {rg:.2e}")
    assert rl < RTOL and rg < RTOL, (rl, rg)
    print("fused kernel == XLA on TPU: OK")


if __name__ == "__main__":
    main()
