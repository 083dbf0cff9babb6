"""TPU-vs-host numerics check for every model family's forward pass.

The axon XLA-TPU backend miscomputes a ``lax.conv`` chained into a stride-2
convolution (~40% deviation; minimal repro 1x1 -> dw/s2, see
models/layers.py:Conv1x1). DeepLab/MobileNetV2 works around it (einsum
1x1s), and its TPU parity is pinned by tests — but ResNet/FPN keeps plain
``lax.conv`` stride-2 consumers (BasicBlock conv1, Bottleneck down_conv),
so this script measures whether the bug fires there too, instead of
assuming either way.

Runs each forward twice — on the default (TPU) backend and on the CPU
backend (the torch-verified oracle) — with identical params/inputs, and
prints the max relative deviation. Exits non-zero above 1e-3 rel.

Usage (TPU tunnel required):
    python scripts/verify_tpu_numerics.py [--families mnv2,fpn18,fpn50,micro]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12))


def _run(fn, params, x, device):
    import jax

    with jax.default_device(device):
        return np.asarray(jax.jit(fn)(jax.device_put(params, device),
                                      jax.device_put(x, device)))


def check(name, make_fn, shape, seed=0, tol=1e-3):
    import jax
    import jax.numpy as jnp

    cpu = jax.devices("cpu")[0]
    acc = jax.devices()[0]
    if acc.platform == "cpu":
        print(f"[{name}] SKIP: no accelerator attached")
        return True

    fn, params = make_fn(shape, seed)
    x = np.random.default_rng(seed).standard_normal(shape).astype(np.float32)
    out_cpu = _run(fn, params, jnp.asarray(x), cpu)
    out_acc = _run(fn, params, jnp.asarray(x), acc)
    rel = _rel(out_acc, out_cpu)
    ok = rel < tol
    print(f"[{name}] rel={rel:.2e} {'OK' if ok else 'DEVIATES'}")
    return ok


def micro(shape, seed):
    """The documented repro family: conv -> stride-2 conv chains."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(seed)
    c = shape[-1]
    k1 = jnp.asarray(rng.standard_normal((3, 3, c, c)).astype(np.float32))
    k2 = jnp.asarray(rng.standard_normal((3, 3, c, c)).astype(np.float32))

    def fn(params, x):
        k1, k2 = params
        dn = lax.conv_dimension_numbers(x.shape, k1.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        h = lax.conv_general_dilated(x, k1, (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=dn,
                                     precision="highest")
        return lax.conv_general_dilated(h, k2, (2, 2), ((1, 1), (1, 1)),
                                        dimension_numbers=dn,
                                        precision="highest")

    return fn, (k1, k2)


def _model_check(network, n_layers):
    def make(shape, seed):
        import jax

        from pixelpick_tpu.config import default_args
        from pixelpick_tpu.models import get_model, init_model

        args = default_args("cv", dir_dataset="/nonexistent",
                            write_files=False, network_name=network,
                            n_layers=n_layers, weight_type="random")
        model = get_model(args)
        params, batch_stats = init_model(model, jax.random.PRNGKey(seed),
                                         shape[1:3])

        def fn(p, x):
            out = model.apply({"params": p, "batch_stats": batch_stats},
                              x, train=False, upsample=False)
            return out["pred"]

        return fn, params

    return make


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="micro,mnv2,fpn18,fpn50")
    ap.add_argument("--hw", type=int, nargs=2, default=(96, 128))
    args = ap.parse_args()

    from pixelpick_tpu.config import enable_compile_cache
    enable_compile_cache()

    fams = {
        "micro": (micro, (1, 32, 32, 8)),
        "mnv2": (_model_check("deeplab", 18), (1, *args.hw, 3)),
        "fpn18": (_model_check("FPN", 18), (1, *args.hw, 3)),
        "fpn50": (_model_check("FPN", 50), (1, *args.hw, 3)),
    }
    ok = True
    for name in args.families.split(","):
        fn, shape = fams[name.strip()]
        ok &= check(name, fn, shape)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
