"""Model factory (reference ``utils/utils.py:15-51 get_model``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _dtype(args):
    return jnp.bfloat16 if getattr(args, "precision", "f32") == "bf16" else jnp.float32


def get_model(args):
    bn_groups = int(getattr(args, "bn_group_size", 0) or 0)
    if getattr(args, "fused_ir", False) and jax.device_count() > 1:
        # a pallas_call inside a sharded jit has no partitioning rule —
        # under a multi-device mesh it fails to compile or silently
        # replicates; --fused_ir is a single-device experiment by design
        raise ValueError(
            "--fused_ir is single-device only (documented experiment, "
            f"PERF.md): {jax.device_count()} devices visible. Drop the "
            "flag or run on one chip.")
    if args.network_name == "deeplab":
        from pixelpick_tpu.models.deeplab import DeepLab
        return DeepLab(
            n_classes=args.n_classes,
            output_stride=16,
            width_mult=args.width_multiplier,
            mc_dropout=args.use_mc_dropout,
            mc_dropout_p=args.mc_dropout_p,
            mc_dropout2d_committee=getattr(args, "mc_dropout2d_committee",
                                           False),
            dtype=_dtype(args),
            bn_groups=bn_groups,
            s2d_until=4 if getattr(args, "s2d_backbone", False) else 0,
            fused_ir=getattr(args, "fused_ir", False),
        )
    if args.network_name == "FPN":
        from pixelpick_tpu.models.fpn import FPNSeg
        return FPNSeg(
            n_classes=args.n_classes,
            n_layers=args.n_layers,
            width_multiplier=args.width_multiplier,
            dilate_scale=8 if args.use_dilated_resnet else 0,
            mc_dropout_p=args.mc_dropout_p,
            dtype=_dtype(args),
            bn_groups=bn_groups,
        )
    raise ValueError(args.network_name)


def init_model(model, rng, input_hw, batch_size: int = 1):
    """Initialise variables with a dummy batch; returns (params, batch_stats)."""
    x = jnp.zeros((batch_size, input_hw[0], input_hw[1], 3), jnp.float32)
    p_rng, d_rng = jax.random.split(jax.random.PRNGKey(rng) if isinstance(rng, int) else rng)
    variables = model.init({"params": p_rng, "dropout": d_rng}, x, train=False)
    return variables["params"], variables.get("batch_stats", {})
