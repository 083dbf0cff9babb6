"""Fused inverted-residual kernel (ops/fused_ir.py, models/fused_block.py)
vs the unfused InvertedResidual modules — interpret mode on CPU.

Forward, batch-stat updates and parameter gradients must agree. The grad
comparison is scaled by the global gradient magnitude: near-zero BN-scale
gradients suffer relu6-boundary mask flips under f32 rounding (an element
sitting at 0/6 crosses the threshold between op orderings), which is noise,
not error.
"""

import jax
import jax.numpy as jnp
import pytest

from pixelpick_tpu.models.fused_block import FusedIRBlock
from pixelpick_tpu.models.mobilenet_v2 import InvertedResidual, MobileNetV2

B, H, W = 8, 9, 10
GROUPS = 4


def _pair(ci, co, dilation, t, dtype, groups=GROUPS):
    ref = InvertedResidual(ci, co, 1, dilation, t, dtype=dtype,
                           bn_groups=groups)
    fused = FusedIRBlock(ci, co, 1, dilation, t, dtype=dtype,
                         bn_groups=groups)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, ci), jnp.float32)
    v = ref.init(jax.random.PRNGKey(0), x.astype(dtype), train=False)
    return ref, fused, x.astype(dtype), v


def test_variable_tree_identical():
    ref, fused, x, v = _pair(16, 16, 1, 6, jnp.float32)
    v2 = fused.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(v2)):
        assert jnp.allclose(a, b), "init values must match"


@pytest.mark.parametrize("dtype,ftol", [(jnp.float32, 3e-5),
                                        (jnp.bfloat16, 4e-2)])
@pytest.mark.parametrize("ci,co,dilation", [(16, 16, 1), (16, 24, 1),
                                            (16, 16, 2)])
def test_forward_and_stats_match(dtype, ftol, ci, co, dilation):
    ref, fused, x, v = _pair(ci, co, dilation, 6, dtype)
    yr, mr = ref.apply(v, x, train=True, mutable=["batch_stats"])
    yf, mf = fused.apply(v, x, train=True, mutable=["batch_stats"])
    assert float(jnp.abs(yr.astype(jnp.float32)
                         - yf.astype(jnp.float32)).max()) < ftol
    for a, b in zip(jax.tree.leaves(mr), jax.tree.leaves(mf)):
        assert float(jnp.abs(a - b).max()) < ftol


def test_eval_exact():
    ref, fused, x, v = _pair(16, 16, 1, 6, jnp.float32)
    yr = ref.apply(v, x, train=False)
    yf = fused.apply(v, x, train=False)
    assert float(jnp.abs(yr - yf).max()) == 0.0


@pytest.mark.parametrize("dtype,gtol", [(jnp.float32, 1e-4),
                                        (jnp.bfloat16, 4e-2)])
def test_grads_match(dtype, gtol):
    ref, fused, x, v = _pair(16, 16, 1, 6, dtype)

    def loss(mod):
        def f(params):
            out, _ = mod.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return (out.astype(jnp.float32) ** 2).sum()
        return f

    gr = jax.grad(loss(ref))(v["params"])
    gf = jax.grad(loss(fused))(v["params"])
    gmax = max(float(jnp.abs(g).max()) for g in jax.tree.leaves(gr))
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gf)):
        assert float(jnp.abs(a.astype(jnp.float32)
                             - b.astype(jnp.float32)).max()) < gtol * gmax


def test_remainder_batch_whole_batch_group():
    """B % bn_groups != 0 falls back to whole-batch moments (the _BNCore
    rule); the kernel runs with group == B and must match closely."""
    ref, fused, x, v = _pair(16, 16, 1, 6, jnp.float32, groups=5)
    yr, mr = ref.apply(v, x, train=True, mutable=["batch_stats"])
    yf, mf = fused.apply(v, x, train=True, mutable=["batch_stats"])
    assert float(jnp.abs(yr - yf).max()) < 3e-5
    for a, b in zip(jax.tree.leaves(mr), jax.tree.leaves(mf)):
        assert float(jnp.abs(a - b).max()) < 3e-5


@pytest.mark.parametrize("stride,t", [(2, 6), (1, 1)])
def test_unfused_inline_path_exact(stride, t):
    """Blocks the kernel never takes (stride 2, t=1) run FusedIRBlock's
    inline math, which must be bit-identical to InvertedResidual."""
    ref = InvertedResidual(16, 24, stride, 1, t, dtype=jnp.float32,
                           bn_groups=GROUPS)
    fused = FusedIRBlock(16, 24, stride, 1, t, dtype=jnp.float32,
                         bn_groups=GROUPS)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 16), jnp.float32)
    v = ref.init(jax.random.PRNGKey(0), x, train=False)
    yr, mr = ref.apply(v, x, train=True, mutable=["batch_stats"])
    yf, mf = fused.apply(v, x, train=True, mutable=["batch_stats"])
    assert float(jnp.abs(yr - yf).max()) == 0.0
    for a, b in zip(jax.tree.leaves(mr), jax.tree.leaves(mf)):
        assert float(jnp.abs(a - b).max()) == 0.0


def test_factory_rejects_fused_ir_on_multi_device_mesh():
    """--fused_ir is single-device only: pallas_call has no partitioning
    rule inside a sharded jit. The factory must refuse it under the
    8-virtual-device test backend (ADVICE r4)."""
    from types import SimpleNamespace
    import pytest
    from pixelpick_tpu.models.factory import get_model

    args = SimpleNamespace(network_name="deeplab", n_classes=11,
                           width_multiplier=1.0, use_mc_dropout=False,
                           mc_dropout_p=0.5, fused_ir=True)
    assert jax.device_count() > 1  # conftest forces 8 virtual devices
    with pytest.raises(ValueError, match="single-device"):
        get_model(args)


def test_mobilenet_fused_flag_matches():
    """MobileNetV2(fused_ir=True) has the identical variable tree and the
    same train-mode output within bf16-ish tolerance (f32 here)."""
    kw = dict(output_stride=16, dtype=jnp.float32, bn_groups=4)
    base = MobileNetV2(**kw)
    fused = MobileNetV2(fused_ir=True, **kw)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 48, 64, 3), jnp.float32)
    v = base.init(jax.random.PRNGKey(0), x, train=False)
    v2 = fused.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    (hr, lr), mr = base.apply(v, x, train=True, mutable=["batch_stats"])
    (hf, lf), mf = fused.apply(v, x, train=True, mutable=["batch_stats"])
    assert float(jnp.abs(hr - hf).max()) < 2e-3
    assert float(jnp.abs(lr - lf).max()) < 2e-3
    for a, b in zip(jax.tree.leaves(mr), jax.tree.leaves(mf)):
        assert float(jnp.abs(a - b).max()) < 1e-3


def test_vmem_gate_tracks_measured_compile_envelope():
    """The default budget must admit exactly the block class measured to
    compile on v5e and reject the classes measured to OOM scoped VMEM
    (PERF.md "Whole-subgraph fusion: measured"): Mosaic's backward
    liveness runs 5-6x the logical estimate, so 64-ch-class estimates
    (~15.7 MB) compile under the 100 MB limit while 96-ch-class
    (23.2 MB -> 121.6 MB actual) and larger OOM."""
    from pixelpick_tpu.models.fused_block import FUSED_VMEM_BUDGET
    from pixelpick_tpu.ops.fused_ir import vmem_estimate_bytes

    measured = [  # (h, w, cin, t, cout, dilation, compiles_on_v5e)
        (23, 30, 64, 6, 64, 1, True),     # b7 class: ran fwd+bwd on chip
        (23, 30, 64, 6, 96, 1, True),     # 64->96 transition: same est
        (23, 30, 96, 6, 96, 1, False),    # measured 121.6 MB scoped OOM
        (23, 30, 160, 6, 160, 2, False),
        (45, 60, 32, 6, 32, 1, False),
        (90, 120, 24, 6, 24, 1, False),
    ]
    for h, w, ci, t, co, d, ok in measured:
        est = vmem_estimate_bytes(4, h, w, ci, ci * t, co, d, 2)
        assert (est <= FUSED_VMEM_BUDGET) == ok, (h, w, ci, co, est)
