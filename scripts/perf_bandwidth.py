"""Empirical HBM-bandwidth probe: does the narrow-C NHWC layout pad lanes?

Times x -> x * a + b with the TENSOR ITSELF as the chained carry (each step
reads the previous step's full output and writes a full tensor — the jit
boundary forces materialisation, so dead-code elimination cannot skip the
write; an earlier version that reduced y[..., :1] measured pure DCE and
read 1.7 TB/s). The tensor is a jit ARGUMENT, not a closure constant —
closed-over constants ship inside the remote-compile request and >300 MB
ones exceed the tunnel's HTTP body limit.

Shapes: (48, 180, 240, C) bf16 for C in {16, 24, 32, 96, 128} plus a
(48, 180, 60, 128) control with the same logical bytes as C=32. If
achieved GB/s collapses for C < 128 while the control runs at full
bandwidth, XLA-TPU stores the minor dim padded to the 128-lane tile and
every unfused pass over the early MobileNetV2 activations pays the pad
bytes — the bandwidth-roofline fact PERF.md rests on.

Usage: python scripts/perf_bandwidth.py
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")
from bench import _timeit_chained  # noqa: E402


def time_elementwise(shape):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x0 = jax.device_put(jnp.asarray(rng.standard_normal(shape), jnp.bfloat16))

    @jax.jit
    def step(x):
        return x * jnp.bfloat16(1.0001) + jnp.bfloat16(0.0001)

    sec = _timeit_chained(lambda i, c: step(c), x0)
    logical_gb = 2 * np.prod(shape) * 2 / 1e9  # read + write, bf16
    return {"ms": 1000 * sec, "logical_GB": round(logical_gb, 3),
            "achieved_GBps": round(logical_gb / sec, 1)}


def main():
    from pixelpick_tpu.config import enable_compile_cache

    enable_compile_cache()
    shapes = [
        (48, 180, 240, 16),
        (48, 180, 240, 24),
        (48, 180, 240, 32),
        (48, 180, 240, 96),
        (48, 180, 240, 128),
        (48, 180, 60, 128),   # control: same logical bytes as C=32
    ]
    out = {}
    for s in shapes:
        out[str(s)] = time_elementwise(s)
        print(s, json.dumps(out[str(s)]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
