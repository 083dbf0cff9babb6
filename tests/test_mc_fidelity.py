"""MC-dropout committee fidelity (reference ``deeplab.py:33-36``).

The reference's ``turn_on_dropout`` re-enables only ``nn.Dropout`` modules;
``nn.Dropout2d`` is NOT an ``nn.Dropout`` subclass, so the MobileNetV2
Dropout2d sites (``mobilenet_v2.py:116,127``) stay INACTIVE during
MC-committee scoring. These tests pin that behaviour on the torch oracle
itself and prove the rebuild reproduces it by default (with
``--mc_dropout2d_committee`` as the documented opt-in deviation)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_reference_turn_on_dropout_leaves_dropout2d_inactive():
    """Oracle pin: after model.eval() + turn_on_dropout(), the reference's
    plain Dropout sites are training=True but its Dropout2d sites are not."""
    torch = pytest.importorskip("torch")
    from tests.test_model_parity import _build_reference_deeplab

    ref = _build_reference_deeplab(use_mc_dropout=True)
    ref.eval()
    ref.turn_on_dropout()  # query.py:152
    d_on, d2_on = [], []
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout2d):
            d2_on.append(m.training)
        elif isinstance(m, torch.nn.Dropout):
            d_on.append(m.training)
    assert d_on and all(d_on), "nn.Dropout sites must be re-enabled"
    assert d2_on and not any(d2_on), \
        "nn.Dropout2d sites must stay inactive (isinstance subtlety)"


def _mnv2_outputs(mc2d_committee, rng_seed):
    from pixelpick_tpu.models.mobilenet_v2 import MobileNetV2

    m = MobileNetV2(mc_dropout=True, mc_dropout_p=0.5,
                    mc_dropout2d_committee=mc2d_committee)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 32, 32, 3)),
                    jnp.float32)
    variables = m.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, x, train=False)
    outs = []
    for s in (rng_seed, rng_seed + 1):
        high, low = m.apply(variables, x, train=False, mc_dropout_on=True,
                            rngs={"dropout": jax.random.PRNGKey(s)})
        outs.append((np.asarray(high), np.asarray(low)))
    return outs


def test_backbone_dropout2d_inactive_during_mc_by_default():
    """Default: MC scoring is deterministic through the backbone — the
    Dropout2d sites don't fire, exactly like the reference committee."""
    (h1, l1), (h2, l2) = _mnv2_outputs(mc2d_committee=False, rng_seed=10)
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_array_equal(l1, l2)


def test_backbone_dropout2d_active_with_committee_flag():
    """--mc_dropout2d_committee: the opt-in deviation adds the Dropout2d
    sites as committee variance sources."""
    (h1, _), (h2, _) = _mnv2_outputs(mc2d_committee=True, rng_seed=20)
    assert not np.array_equal(h1, h2)


def test_full_model_committee_variance_comes_from_head_dropouts():
    """DeepLab under MC: different committee keys give different predictions
    (ASPP/head nn.Dropout sites are active, turn_on_dropout semantics) even
    though the backbone Dropout2d sites stay frozen."""
    from pixelpick_tpu.models.deeplab import DeepLab

    m = DeepLab(n_classes=5, mc_dropout=True, mc_dropout_p=0.5)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 32, 32, 3)),
                    jnp.float32)
    variables = m.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, x, train=False)
    outs = [np.asarray(m.apply(variables, x, train=False, mc_dropout_on=True,
                               rngs={"dropout": jax.random.PRNGKey(s)})["pred"])
            for s in (3, 4)]
    assert not np.array_equal(outs[0], outs[1])


def test_mc_committee_uncertainty_matches_oracle_at_p0(monkeypatch):
    """Committee plumbing vs the torch oracle: with every dropout site
    neutralised on both sides the 3-step committee is deterministic, so the
    averaged uncertainty map (incl. the reference's up_map-typo fix,
    query.py:186) must rank pixels like the oracle's accumulated map."""
    torch = pytest.importorskip("torch")
    import flax.linen as nn
    from tests.test_model_parity import _build_reference_deeplab
    from pixelpick_tpu.models.convert import convert_deeplab
    from pixelpick_tpu.models.deeplab import DeepLab
    from pixelpick_tpu.active.acquisition import make_score_fn

    # the head carries a HARDCODED Dropout(0.5) (decoders.py:110) that MC
    # activates; zero every site on both frameworks so the committee
    # members are deterministic and comparable
    monkeypatch.setattr(nn.Dropout, "__call__",
                        lambda self, x, **kw: x)
    ref = _build_reference_deeplab(use_mc_dropout=True)
    for mod in ref.modules():
        if isinstance(mod, (torch.nn.Dropout, torch.nn.Dropout2d)):
            mod.p = 0.0
    ref.eval()
    ref.turn_on_dropout()

    state = {k: v for k, v in ref.state_dict().items()}
    params, batch_stats = convert_deeplab(state, n_classes=11)
    ours = DeepLab(n_classes=11, mc_dropout=True, mc_dropout_p=0.0)

    rng = np.random.default_rng(2)
    x = rng.integers(0, 255, (1, 48, 64, 3), dtype=np.uint8)
    xf = x.astype(np.float32) / 255.0
    mean = [0.4, 0.45, 0.5]
    std = [0.25, 0.25, 0.25]
    xt = torch.tensor((xf - np.array(mean)) / np.array(std),
                      dtype=torch.float32).permute(0, 3, 1, 2)

    n_steps = 3
    with torch.no_grad():
        uc_sum = torch.zeros(48, 64)
        for _ in range(n_steps):  # query.py:177-187 with the typo fixed
            prob = torch.softmax(ref(xt)["pred"], dim=1)
            top2 = prob.topk(2, dim=1).values
            uc_sum += (top2[:, 0] - top2[:, 1]).abs().squeeze(0)
        uc_ref = (uc_sum / n_steps).numpy()

    score_fn = make_score_fn(ours, strategy="margin_sampling", n_classes=11,
                             mean=mean, std=std, n_pixels=10,
                             top_n_percent=0.0, reverse_order=False,
                             ignore_index=11, mc_n_steps=n_steps)
    idx, _ = score_fn(params, batch_stats,
                      {"x": x, "excluded": np.zeros((1, 48, 64), bool),
                       "y": np.zeros((1, 48, 64), np.int32)},
                      jax.random.PRNGKey(0))
    # the committee's smallest-margin picks land inside the oracle's top
    # ranks (a couple of boundary swaps allowed: torch/jax convs round
    # differently at ~1e-6 against ~1e-4 margin gaps)
    order = np.argsort(uc_ref.ravel())
    got = set(np.asarray(idx)[0].tolist())
    assert len(got & set(order[:10].tolist())) >= 8
    assert got <= set(order[:14].tolist())
