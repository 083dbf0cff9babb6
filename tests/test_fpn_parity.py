"""FPN/ResNet architecture parity vs the torch reference (weight-for-weight,
random weights through the converter; reference imported as oracle only)."""

import sys
from argparse import Namespace

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _build_reference_fpn(n_layers=18, n_classes=11):
    if REF not in sys.path:
        sys.path.append(REF)
    import torch.utils.model_zoo as mz
    mz.load_url = lambda *a, **k: {}
    from networks.model import FPNSeg as TorchFPNSeg

    args = Namespace(n_classes=n_classes, width_multiplier=1.0,
                     n_layers=n_layers, weight_type="random",
                     use_dilated_resnet=True)
    torch.manual_seed(0)
    model = TorchFPNSeg(args, load_pretrained=False)
    model.eval()
    return model


@pytest.mark.parametrize("n_layers", [18, 50])
def test_fpn_forward_matches_torch(n_layers):
    ref = _build_reference_fpn(n_layers=n_layers)
    from pixelpick_tpu.models.convert import convert_fpnseg
    from pixelpick_tpu.models.fpn import FPNSeg

    params, stats = convert_fpnseg(dict(ref.state_dict()), n_classes=11,
                                   n_layers=n_layers)
    ours = FPNSeg(n_classes=11, n_layers=n_layers)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = ref(torch.from_numpy(x).permute(0, 3, 1, 2))
    t_pred = t_out["pred"].permute(0, 2, 3, 1).numpy()

    fwd = jax.jit(lambda v, z: ours.apply(v, z, train=False))
    j_out = fwd({"params": params, "batch_stats": stats}, jnp.asarray(x))
    assert j_out["pred"].shape == t_pred.shape
    np.testing.assert_allclose(np.asarray(j_out["pred"]), t_pred,
                               rtol=1e-3, atol=1e-4)


def test_deepbase_resnet50_backbone_parity():
    """Deep-base stem (3x 3x3 convs, resnet_models.py:103-113) + classic
    stride-32 stages vs the torch reference."""
    if REF not in sys.path:
        sys.path.append(REF)
    import torch.utils.model_zoo as mz
    mz.load_url = lambda *a, **k: {}
    from networks.backbones.resnet_models import deepbase_resnet50

    torch.manual_seed(0)
    ref = deepbase_resnet50(pretrained=None)
    ref.eval()

    from pixelpick_tpu.models.convert import convert_resnet_backbone
    from pixelpick_tpu.models.resnet import ResNetBackbone

    state = {f"base.{k}": v for k, v in ref.state_dict().items()}
    params, stats = convert_resnet_backbone(state, 50, prefix="base")
    ours = ResNetBackbone(n_layers=50, dilate_scale=0, deep_base=True)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        h = ref.prefix(tx)
        h = ref.maxpool(h)
        feats_t = []
        for layer in (ref.layer1, ref.layer2, ref.layer3, ref.layer4):
            h = layer(h)
            feats_t.append(h.permute(0, 2, 3, 1).numpy())

    fwd = jax.jit(lambda v, z: ours.apply(v, z, train=False))
    feats_j = fwd({"params": params, "batch_stats": stats}, jnp.asarray(x))
    for fj, ft in zip(feats_j, feats_t):
        np.testing.assert_allclose(np.asarray(fj), ft, rtol=1e-3, atol=1e-4)
