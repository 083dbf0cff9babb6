"""Architecture parity: the Flax DeepLab vs the torch reference, weight-for-
weight. The reference implementation (read-only at /root/reference) is
imported purely as a *test oracle*: random torch weights are converted with
``models/convert.py`` and both forward passes must agree.

This simultaneously validates (a) the layer-by-layer architecture (padding
placement, dilation schedule, BN semantics, align-corners upsamples) and
(b) the pretrained-checkpoint converter."""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
H, W = 96, 128  # small multiple-of-16 size to keep CPU runtime sane


def _build_reference_deeplab(n_classes=11, use_mc_dropout=False):
    if REF not in sys.path:
        sys.path.append(REF)
    import torch.utils.model_zoo as model_zoo
    model_zoo.load_url = lambda *a, **k: {}  # offline: skip pretrained fetch
    from argparse import Namespace
    from networks.deeplab import DeepLab as TorchDeepLab

    args = Namespace(use_mc_dropout=use_mc_dropout, mc_dropout_p=0.2,
                     n_classes=n_classes)
    torch.manual_seed(0)
    model = TorchDeepLab(args)
    model.eval()
    return model


@pytest.fixture(scope="module")
def parity_pair():
    ref = _build_reference_deeplab()
    from pixelpick_tpu.models.convert import convert_deeplab
    from pixelpick_tpu.models.deeplab import DeepLab

    state = {k: v for k, v in ref.state_dict().items()}
    params, batch_stats = convert_deeplab(state, n_classes=11)
    ours = DeepLab(n_classes=11)
    return ref, ours, params, batch_stats


def test_converted_tree_matches_init_structure(parity_pair):
    _ref, ours, params, batch_stats = parity_pair
    variables = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
                          train=False)
    ref_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(variables["params"])[0]}
    got_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    assert got_paths == ref_paths
    for (p1, a), (p2, b) in zip(
        sorted(jax.tree_util.tree_flatten_with_path(variables["params"])[0],
               key=lambda t: jax.tree_util.keystr(t[0])),
        sorted(jax.tree_util.tree_flatten_with_path(params)[0],
               key=lambda t: jax.tree_util.keystr(t[0])),
    ):
        assert a.shape == np.asarray(b).shape, (jax.tree_util.keystr(p1), a.shape, b.shape)


def test_forward_matches_torch_eval(parity_pair):
    ref, ours, params, batch_stats = parity_pair
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, H, W, 3)).astype(np.float32)

    with torch.no_grad():
        t_out = ref(torch.from_numpy(x).permute(0, 3, 1, 2))
    t_pred = t_out["pred"].permute(0, 2, 3, 1).numpy()
    t_emb = t_out["emb"].permute(0, 2, 3, 1).numpy()

    fwd = jax.jit(lambda v, z: ours.apply(v, z, train=False))
    j_out = fwd({"params": params, "batch_stats": batch_stats}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out["pred"]), t_pred,
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_out["emb"]), t_emb,
                               rtol=1e-3, atol=1e-4)


def test_lowres_head_equals_upsampled_gather(parity_pair):
    """upsample=False + sparse gather == full-res logits at those pixels."""
    from pixelpick_tpu.ops.resize import gather_bilinear_align_corners

    _ref, ours, params, batch_stats = parity_pair
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, H, W, 3)).astype(np.float32)
    v = {"params": params, "batch_stats": batch_stats}
    full = jax.jit(lambda v, z: ours.apply(v, z, train=False))(v, jnp.asarray(x))["pred"]
    low = jax.jit(lambda v, z: ours.apply(v, z, train=False, upsample=False))(
        v, jnp.asarray(x))["pred"]
    ys = rng.integers(0, H, (1, 17)); xs = rng.integers(0, W, (1, 17))
    coords = jnp.asarray(np.stack([ys, xs], -1), jnp.int32)
    sparse = gather_bilinear_align_corners(low, coords, (H, W))
    expected = np.asarray(full)[0, ys[0], xs[0]]
    np.testing.assert_allclose(np.asarray(sparse)[0], expected, rtol=1e-4, atol=1e-5)
