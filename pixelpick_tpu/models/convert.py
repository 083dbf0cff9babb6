"""PyTorch checkpoint -> Flax params converter.

The reference consumes torch-format pretrained weights: MobileNetV2 ImageNet
weights (``networks/mobilenet_v2.py:139-147``), torchvision ResNets and
MoCo-v2 with key surgery (``networks/encoder.py:4-15``,
``utils/utils.py:19-47``). This module maps those state_dicts onto our Flax
module trees:

- conv ``OIHW -> HWIO`` (depthwise convs land as ``(kh, kw, 1, C)``, which is
  exactly Flax's grouped-conv kernel layout);
- BatchNorm ``weight/bias -> scale/bias`` params and
  ``running_mean/running_var -> batch_stats mean/var``.

Only NumPy is required; tensors may come from ``torch.load`` (call
``.numpy()`` upstream or pass torch tensors — both handled).

These mappings also back the architecture-parity tests: random torch
reference weights are pushed through this converter and both frameworks'
forward passes are compared (``tests/test_model_parity.py``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from pixelpick_tpu.models.mobilenet_v2 import block_plan


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv(state: dict, key: str) -> np.ndarray:
    return _np(state[key]).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _bn(params: dict, stats: dict, prefix: Tuple[str, ...], state: dict,
        torch_key: str) -> None:
    _set(params, prefix + ("bn", "scale"), _np(state[f"{torch_key}.weight"]))
    _set(params, prefix + ("bn", "bias"), _np(state[f"{torch_key}.bias"]))
    _set(stats, prefix + ("bn", "mean"), _np(state[f"{torch_key}.running_mean"]))
    _set(stats, prefix + ("bn", "var"), _np(state[f"{torch_key}.running_var"]))


def convert_mobilenet_v2(state: dict, output_stride: int = 16,
                         width_mult: float = 1.0, prefix: str = "features"
                         ) -> Tuple[dict, dict]:
    """Torch MobileNetV2 feature-extractor state_dict -> (params, batch_stats).

    Torch layout (from the reference's nn.Sequential structure):
    ``features.0.{0,1}`` stem conv+BN; ``features.{i+1}.conv.{j}`` blocks with
    ``j`` = 0/1 (expand conv+BN), 3/4 (dw conv+BN), 6/7 (project conv+BN) for
    expand_ratio != 1, else 0/1 (dw) and 3/4 (project).
    """
    params: dict = {}
    stats: dict = {}
    _set(params, ("stem", "kernel"), _conv(state, f"{prefix}.0.0.weight"))
    _bn(params, stats, ("stem_bn",), state, f"{prefix}.0.1")

    plan, _ = block_plan(output_stride, width_mult)
    for i, (_inp, _oup, _s, _d, t) in enumerate(plan):
        tk = f"{prefix}.{i + 1}.conv"
        blk = f"block_{i}"
        if t == 1:
            layers = [("dw", 0), ("dw_bn", 1), ("project", 3), ("project_bn", 4)]
        else:
            layers = [("expand", 0), ("expand_bn", 1), ("dw", 3), ("dw_bn", 4),
                      ("project", 6), ("project_bn", 7)]
        for name, j in layers:
            if name.endswith("_bn"):
                _bn(params, stats, (blk, name), state, f"{tk}.{j}")
            else:
                _set(params, (blk, name, "kernel"), _conv(state, f"{tk}.{j}.weight"))
    return params, stats


def convert_deeplab(state: dict, n_classes: int, output_stride: int = 16,
                    width_mult: float = 1.0) -> Tuple[dict, dict]:
    """Full reference DeepLab state_dict -> (params, batch_stats)."""
    params: dict = {}
    stats: dict = {}
    bb_params, bb_stats = convert_mobilenet_v2(
        state, output_stride, width_mult, prefix="backbone.features")
    params["backbone"] = bb_params
    stats["backbone"] = bb_stats

    aspp_p: dict = {}
    aspp_s: dict = {}
    for i in range(1, 5):
        _set(aspp_p, (f"aspp{i}", "kernel"), _conv(state, f"aspp.aspp{i}.atrous_conv.weight"))
        _bn(aspp_p, aspp_s, (f"aspp{i}_bn",), state, f"aspp.aspp{i}.bn")
    _set(aspp_p, ("gap_conv", "kernel"), _conv(state, "aspp.global_avg_pool.1.weight"))
    _bn(aspp_p, aspp_s, ("gap_bn",), state, "aspp.global_avg_pool.2")
    _set(aspp_p, ("proj", "kernel"), _conv(state, "aspp.conv1.weight"))
    _bn(aspp_p, aspp_s, ("proj_bn",), state, "aspp.bn1")
    params["aspp"] = aspp_p
    stats["aspp"] = aspp_s

    _set(params, ("low_level_conv", "kernel"), _conv(state, "low_level_conv.0.weight"))
    _bn(params, stats, ("low_level_bn",), state, "low_level_conv.1")

    head_p: dict = {}
    head_s: dict = {}
    _set(head_p, ("conv1", "kernel"), _conv(state, "seg_head.segment_head.0.weight"))
    _bn(head_p, head_s, ("bn1",), state, "seg_head.segment_head.1")
    _set(head_p, ("conv2", "kernel"), _conv(state, "seg_head.segment_head.4.weight"))
    _bn(head_p, head_s, ("bn2",), state, "seg_head.segment_head.5")
    _set(head_p, ("classifier", "kernel"), _conv(state, "seg_head.classifier.weight"))
    _set(head_p, ("classifier", "bias"), _np(state["seg_head.classifier.bias"]))
    params["seg_head"] = head_p
    stats["seg_head"] = head_s
    return params, stats


def load_pretrained_backbone(params: dict, batch_stats: dict,
                             ckpt_path: str) -> Tuple[dict, dict]:
    """Overlay a converted pretrained backbone (npz of flattened paths)."""
    data = np.load(ckpt_path, allow_pickle=True)
    tree = data["tree"].item() if "tree" in data else dict(data)
    import jax

    flat_new = {"/".join(map(str, k)): v for k, v in tree.items()} \
        if isinstance(next(iter(tree)), tuple) else tree
    params = jax.tree.map(lambda x: x, params)  # copy
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    # best-effort name-based overlay
    out = params
    for path, _leaf in flat:
        key = "/".join(p.key for p in path)
        if key in flat_new:
            node = out
            for p in path[:-1]:
                node = node[p.key]
            node[path[-1].key] = np.asarray(flat_new[key])
    return out, batch_stats


# --------------------------- ResNet / FPN ---------------------------

def adapt_torchvision_resnet_keys(state: dict) -> dict:
    """Raw torchvision ResNet checkpoint -> the reference's naming, which
    wraps the stem in a 'prefix' Sequential (resnet_models.py:115-119)."""
    out = {}
    for k, v in state.items():
        if k.startswith(("conv1.", "bn1.")):
            out[f"prefix.{k}"] = v
        elif k.startswith(("fc.",)):
            continue
        else:
            out[k] = v
    return out


def adapt_moco_v2_keys(state: dict) -> dict:
    """MoCo-v2 checkpoint key surgery (utils/utils.py:19-47): strip the
    momentum-encoder prefix, drop the projection head, route the stem into
    'prefix'."""
    out = {}
    for k, v in state.items():
        k = k.replace("module.encoder_q.", "").replace("module.", "")
        if k.startswith("fc."):
            continue
        if k.startswith(("conv1.", "bn1.")):
            k = f"prefix.{k}"
        out[k] = v
    return out


def convert_resnet_backbone(state: dict, n_layers: int,
                            prefix: str = "") -> Tuple[dict, dict]:
    """Reference-named ResNet state_dict -> our ResNetBackbone tree.

    Torch naming (under ``prefix``): ``prefix.conv1/bn1`` stem,
    ``layer{L}.{B}.conv{i}/bn{i}`` blocks, ``layer{L}.{B}.downsample.0/1``.
    """
    from pixelpick_tpu.models.resnet import LAYER_SPECS

    p = (prefix + ".") if prefix else ""
    params: dict = {}
    stats: dict = {}
    _set(params, ("conv1", "kernel"), _conv(state, f"{p}prefix.conv1.weight"))
    _bn(params, stats, ("bn1",), state, f"{p}prefix.bn1")

    block_kind, depths = LAYER_SPECS[n_layers]
    n_convs = 2 if block_kind == "basic" else 3
    for li, n_blocks in enumerate(depths, start=1):
        for bi in range(n_blocks):
            tk = f"{p}layer{li}.{bi}"
            blk = f"layer{li}_{bi}"
            for ci in range(1, n_convs + 1):
                _set(params, (blk, f"conv{ci}", "kernel"),
                     _conv(state, f"{tk}.conv{ci}.weight"))
                _bn(params, stats, (blk, f"bn{ci}"), state, f"{tk}.bn{ci}")
            if f"{tk}.downsample.0.weight" in state:
                _set(params, (blk, "down_conv", "kernel"),
                     _conv(state, f"{tk}.downsample.0.weight"))
                _bn(params, stats, (blk, "down_bn"), state, f"{tk}.downsample.1")
    return params, stats


def convert_fpnseg(state: dict, n_classes: int, n_layers: int) -> Tuple[dict, dict]:
    """Full reference FPNSeg state_dict -> (params, batch_stats).

    Torch naming: ``encoder.base.*`` (dilated ResNet) and ``decoder.*``
    (lat_layer_{0..3}, upsample_blocks_{0..3}.{i}.block.{0,1}, classifier).
    """
    enc_p, enc_s = convert_resnet_backbone(state, n_layers, prefix="encoder.base")
    params = {"encoder": enc_p}
    stats = {"encoder": enc_s}

    dec_p: dict = {}
    for i in range(4):
        _set(dec_p, (f"lat_layer_{i}", "kernel"),
             _conv(state, f"decoder.lat_layer_{i}.weight"))
        _set(dec_p, (f"lat_layer_{i}", "bias"),
             _np(state[f"decoder.lat_layer_{i}.bias"]))
    for ci, n in ((0, 3), (1, 3), (2, 3), (3, 2)):
        for bi in range(n):
            tk = f"decoder.upsample_blocks_{ci}.{bi}.block"
            base = (f"upsample_blocks_{ci}_{bi}",)
            _set(dec_p, base + ("conv", "kernel"), _conv(state, f"{tk}.0.weight"))
            _set(dec_p, base + ("conv", "bias"), _np(state[f"{tk}.0.bias"]))
            _set(dec_p, base + ("gn", "scale"), _np(state[f"{tk}.1.weight"]))
            _set(dec_p, base + ("gn", "bias"), _np(state[f"{tk}.1.bias"]))
    _set(dec_p, ("classifier", "kernel"), _conv(state, "decoder.classifier.weight"))
    _set(dec_p, ("classifier", "bias"), _np(state["decoder.classifier.bias"]))
    params["decoder"] = dec_p
    stats["decoder"] = {}
    return params, stats
