"""Empirical HBM-bandwidth probe: achieved GB/s vs minor-dim (channel) width.

Each timed step is a jitted ``lax.fori_loop`` of K involution passes
``x -> c - x`` over a >VMEM tensor, with the trip count passed as a
TRACED device scalar: a static bound gets fully unrolled and the unrolled
involution chain algebraically collapses to a no-op (measured 2.7 "TB/s";
see git history), while a dynamic bound forces the body to execute K
times, each iteration reading and writing the full tensor through HBM.
K=64 makes one step ~40 ms, far above the tunnel's dispatch jitter that
drowned an earlier per-dispatch version of this probe.

All shapes hold the same logical bytes (265 MB bf16) while the channel
(minor) dim varies 16..128: if XLA-TPU stored the minor dim padded to the
128-lane tile, achieved GB/s would collapse ~8x at C=16. (Spoiler from
the stem probes in PERF.md: it does not — uint8/bf16 narrow-minor buffers
are read near full bandwidth; the C=128 row doubles as the empirical HBM
roofline through this stack, the bandwidth analogue of matmul_peak.)

Usage: python scripts/perf_bandwidth.py
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")
from bench import _timeit_chained  # noqa: E402

K = 64  # involution passes per timed step


def time_elementwise(shape):
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    x0 = jax.device_put(jnp.asarray(rng.standard_normal(shape), jnp.bfloat16))

    n_dev = jax.device_put(jnp.int32(K))  # traced bound: no unrolling

    @jax.jit
    def step(x, n):
        return lax.fori_loop(
            0, n, lambda i, z: jnp.bfloat16(1.5) - z, x)

    sec = _timeit_chained(lambda i, c: step(c, n_dev), step(x0, n_dev))
    logical_gb = 2 * K * np.prod(shape) * 2 / 1e9  # K * (read + write), bf16
    return {"ms": 1000 * sec, "logical_GB": round(logical_gb, 1),
            "achieved_GBps": round(logical_gb / sec, 1)}


def main():
    from pixelpick_tpu.config import enable_compile_cache

    enable_compile_cache()
    # constant logical bytes (96*360*W*C*2 = 265 MB), minor dim varying
    shapes = [
        (96, 360, 240, 16),
        (96, 360, 160, 24),
        (96, 360, 120, 32),
        (96, 360, 40, 96),
        (96, 360, 30, 128),
    ]
    out = {}
    for s in shapes:
        out[str(s)] = time_elementwise(s)
        print(s, json.dumps(out[str(s)]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
