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

import os
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


def _flatten(tree: dict, prefix=()) -> dict:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def overlay_tree(base: dict, new: dict, verbose: bool = False) -> dict:
    """Replace every leaf of ``base`` that exists (same path + shape) in
    ``new`` — partial loading like the reference's state-dict filtering
    (mobilenet_v2.py:139-147)."""
    flat_new = _flatten(new)

    def rec(node, prefix):
        out = {}
        for k, v in node.items():
            p = prefix + (k,)
            if isinstance(v, dict):
                out[k] = rec(v, p)
            elif p in flat_new and np.shape(flat_new[p]) == np.shape(v):
                out[k] = np.asarray(flat_new[p], dtype=np.asarray(v).dtype)
            else:
                if verbose and p in flat_new:
                    print(f"shape mismatch at {'/'.join(p)}, keeping init")
                out[k] = v
        return out

    return rec(base, ())


def load_pretrained_ckpt(params: dict, batch_stats: dict,
                         ckpt_path: str) -> Tuple[dict, dict]:
    """Overlay a converted checkpoint (msgpack {'params','batch_stats'})
    onto freshly initialised variables; missing subtrees keep their init."""
    import flax.serialization

    with open(ckpt_path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    params = overlay_tree(params, payload.get("params", {}))
    batch_stats = overlay_tree(batch_stats, payload.get("batch_stats", {}))
    return params, batch_stats


# Upstream weight URLs the reference consumes: MobileNetV2 ImageNet
# (networks/mobilenet_v2.py:140), torchvision ResNets (the files
# networks/encoder.py:4-15 expects under pretrained/), MoCo-v2 800ep.
FETCH_URLS = {
    "mobilenet_v2": "http://jeff95.me/models/mobilenet_v2-6a65762b.pth",
    "resnet18": "https://download.pytorch.org/models/resnet18-5c106cde.pth",
    "resnet34": "https://download.pytorch.org/models/resnet34-333f7ec4.pth",
    "resnet50": "https://download.pytorch.org/models/resnet50-19c8e357.pth",
    "resnet101": "https://download.pytorch.org/models/resnet101-5d3b4d8f.pth",
    "moco_v2": ("https://dl.fbaipublicfiles.com/moco/moco_checkpoints/"
                "moco_v2_800ep/moco_v2_800ep_pretrain.pth.tar"),
}


def fetch_weights(name: str, cache_dir: str = "") -> str:
    """Download the named upstream torch checkpoint into the cache dir and
    return its path. Egress-gated: fails with a clear message (exit 3) when
    the environment has no network access."""
    import urllib.error
    import urllib.request

    url = FETCH_URLS[name]
    cache_dir = cache_dir or os.path.expanduser("~/.cache/pixelpick_tpu")
    os.makedirs(cache_dir, exist_ok=True)
    dst = os.path.join(cache_dir, url.rsplit("/", 1)[-1])
    if os.path.isfile(dst):
        print(f"using cached {dst}")
        return dst
    print(f"fetching {url} -> {dst}")
    try:
        urllib.request.urlretrieve(url, dst + ".part")
    except (urllib.error.URLError, OSError) as e:
        raise SystemExit(
            f"could not fetch {url}: {e}\n"
            "This environment has no egress. Download the file elsewhere, "
            f"place it at {dst}, and re-run — or pass the .pth path "
            "directly as SRC.") from e
    os.replace(dst + ".part", dst)
    return dst


def main():
    """CLI: convert a torch checkpoint to a --pretrained_ckpt msgpack.

    Usage:
      python -m pixelpick_tpu.models.convert IN.pth OUT.ckpt \
          --kind {mobilenet_v2,deeplab,resnet,fpn} [--n_layers 50]
          [--weight_type {supervised,moco_v2}] [--n_classes 11]

    One-liner fetch+convert (reference get_pretrained_model.sh /
    mobilenet_v2.py:139-147 equivalent; egress-gated):
      python -m pixelpick_tpu.models.convert --fetch mobilenet_v2 OUT.ckpt
      python -m pixelpick_tpu.models.convert --fetch resnet50 OUT.ckpt
      python -m pixelpick_tpu.models.convert --fetch moco_v2 OUT.ckpt
    """
    from argparse import ArgumentParser

    import flax.serialization
    import torch

    parser = ArgumentParser("torch -> pixelpick-tpu checkpoint converter")
    parser.add_argument("src", nargs="?", default="")
    parser.add_argument("dst")
    parser.add_argument("--fetch", default="", choices=[""] + list(FETCH_URLS),
                        help="download this upstream checkpoint instead of "
                             "reading SRC (cached in ~/.cache/pixelpick_tpu)")
    parser.add_argument("--kind", default="",
                        choices=["", "mobilenet_v2", "deeplab", "resnet", "fpn"])
    parser.add_argument("--n_layers", type=int, default=50)
    parser.add_argument("--n_classes", type=int, default=11)
    parser.add_argument("--weight_type", default="supervised",
                        choices=["supervised", "moco_v2"])
    args = parser.parse_args()

    if args.fetch:
        args.src = fetch_weights(args.fetch)
        if not args.kind:  # infer: resnet* -> resnet, moco_v2 -> resnet
            args.kind = "mobilenet_v2" if args.fetch == "mobilenet_v2" else "resnet"
        if args.fetch == "moco_v2":
            args.weight_type = "moco_v2"
        elif args.fetch.startswith("resnet"):
            args.n_layers = int(args.fetch[len("resnet"):])
    if not args.src or not args.kind:
        parser.error("pass SRC and --kind, or --fetch NAME")

    blob = torch.load(args.src, map_location="cpu", weights_only=False)
    state = blob.get("state_dict", blob.get("model", blob)) \
        if isinstance(blob, dict) else blob
    state = {k: v for k, v in state.items()}

    if args.kind == "mobilenet_v2":
        params, stats = convert_mobilenet_v2(state)
        params, stats = {"backbone": params}, {"backbone": stats}
    elif args.kind == "deeplab":
        params, stats = convert_deeplab(state, args.n_classes)
    elif args.kind == "resnet":
        if args.weight_type == "moco_v2":
            state = adapt_moco_v2_keys(state)
        elif not any(k.startswith("prefix.") for k in state):
            state = adapt_torchvision_resnet_keys(state)
        params, stats = convert_resnet_backbone(state, args.n_layers)
        params, stats = {"encoder": params}, {"encoder": stats}
    else:
        params, stats = convert_fpnseg(state, args.n_classes, args.n_layers)

    payload = {"params": params, "batch_stats": stats}
    with open(args.dst, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    n = len(_flatten(params))
    print(f"wrote {args.dst} ({n} param tensors)")


if __name__ == "__main__":
    main()


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

    Torch naming (under ``prefix``): ``prefix.conv1/bn1`` stem (deep-base
    variants add conv2/bn2/conv3/bn3, resnet_models.py:103-113),
    ``layer{L}.{B}.conv{i}/bn{i}`` blocks, ``layer{L}.{B}.downsample.0/1``.
    """
    from pixelpick_tpu.models.resnet import LAYER_SPECS

    p = (prefix + ".") if prefix else ""
    params: dict = {}
    stats: dict = {}
    stem_convs = [1]
    if f"{p}prefix.conv3.weight" in state:  # deep-base stem
        stem_convs = [1, 2, 3]
    for ci in stem_convs:
        _set(params, (f"conv{ci}", "kernel"),
             _conv(state, f"{p}prefix.conv{ci}.weight"))
        _bn(params, stats, (f"bn{ci}",), state, f"{p}prefix.bn{ci}")

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
