"""Acquisition engine semantics (reference query.py:33-69,144-247)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixelpick_tpu.active.acquisition import (
    uncertainty_map, fill_value, _select_topk, make_score_fn,
)


def test_uncertainty_strategies_match_reference_formulas():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 4, 5, 6)).astype(np.float32)
    prob = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    p = jnp.asarray(prob)

    ent = np.asarray(uncertainty_map(p, "entropy"))
    np.testing.assert_allclose(ent, -(prob * np.log(prob)).sum(-1), rtol=1e-5)

    lc = np.asarray(uncertainty_map(p, "least_confidence"))
    np.testing.assert_allclose(lc, 1 - prob.max(-1), rtol=1e-5)

    ms = np.asarray(uncertainty_map(p, "margin_sampling"))
    srt = np.sort(prob, -1)
    np.testing.assert_allclose(ms, np.abs(srt[..., -1] - srt[..., -2]), rtol=1e-5)

    rnd = np.asarray(uncertainty_map(p, "random", jax.random.PRNGKey(0)))
    assert rnd.shape == (2, 4, 5) and (0 <= rnd).all() and (rnd <= 1).all()


def test_fill_values():
    assert fill_value("entropy") == 0.0
    assert fill_value("least_confidence") == 0.0
    assert fill_value("margin_sampling") == 1.0
    assert fill_value("random") == 1.0


def test_select_topk_picks_most_uncertain():
    hw = (8, 10)
    uc = np.ones(80, np.float32)  # margin: 1 = most certain
    best = [3, 17, 42]
    uc[best] = 0.01  # tiny margins = most uncertain
    idx = np.asarray(_select_topk(
        jnp.asarray(uc), jax.random.PRNGKey(0), strategy="margin_sampling",
        n_pixels=3, top_n_percent=0.0, reverse_order=False, hw=hw))
    assert sorted(idx.tolist()) == best

    # entropy: largest wins
    uc2 = np.zeros(80, np.float32)
    uc2[best] = 5.0
    idx2 = np.asarray(_select_topk(
        jnp.asarray(uc2), jax.random.PRNGKey(0), strategy="entropy",
        n_pixels=3, top_n_percent=0.0, reverse_order=False, hw=hw))
    assert sorted(idx2.tolist()) == best


def test_select_topk_top_n_percent_subsamples_from_topk():
    hw = (10, 10)
    uc = np.linspace(0, 1, 100).astype(np.float32)  # entropy-like
    idx = np.asarray(_select_topk(
        jnp.asarray(uc), jax.random.PRNGKey(1), strategy="entropy",
        n_pixels=4, top_n_percent=0.2, reverse_order=False, hw=hw))
    assert len(set(idx.tolist())) == 4
    assert all(i >= 80 for i in idx), idx  # all from the top 20%


def test_score_fn_end_to_end_excludes_labelled_and_void():
    import flax.linen as nn
    from pixelpick_tpu.ops.resize import resize_align_corners

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False, mc_dropout_on=False, upsample=True):
            pred = nn.Conv(4, (1, 1), name="cls")(x)
            return {"pred": pred, "emb": x}

    model = Tiny()
    x = np.random.default_rng(0).integers(0, 255, (2, 8, 8, 3), dtype=np.uint8)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 3)))

    excluded = np.zeros((2, 8, 8), bool)
    excluded[:, :, :4] = True  # left half already labelled
    y = np.zeros((2, 8, 8), np.int32)
    y[:, 0, :] = 11  # first row void (ignore_index=11)

    score_fn = make_score_fn(model, strategy="margin_sampling", n_classes=4,
                             mean=[0.5] * 3, std=[0.25] * 3, n_pixels=5,
                             top_n_percent=0.0, reverse_order=False,
                             ignore_index=11, mc_n_steps=0)
    idx, stats = score_fn(variables["params"], {},
                          {"x": x, "excluded": excluded, "y": y},
                          jax.random.PRNGKey(0))
    idx = np.asarray(idx)
    assert idx.shape == (2, 5)
    ys, xs = idx // 8, idx % 8
    assert (xs >= 4).all(), "picked an excluded pixel"
    assert (ys >= 1).all(), "picked a void pixel"
    assert stats["entropy"].shape == (2, 5)
    assert stats["coverage"].shape == (2,)
    # >= 2 valid picks: coverage is a finite mean pairwise distance
    assert np.isfinite(np.asarray(stats["coverage"])).all()


def test_spatial_coverage_nan_below_two_picks():
    """An image with < 2 valid picks has no pair distances: per-image
    coverage is NaN exactly as the reference's _spatial_coverage
    (query.py:269-279) — 0.0 would bias the round average — and QueryStats
    aggregates with nanmean (documented deviation from the reference's
    np.mean, which one sparse image poisons to NaN)."""
    import flax.linen as nn

    from pixelpick_tpu.active.stats import QueryStats

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False, upsample=True):
            return {"pred": nn.Conv(4, (1, 1))(x), "emb": x}

    model = Tiny()
    x = np.random.default_rng(0).integers(0, 255, (2, 8, 8, 3),
                                          dtype=np.uint8)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 3)))
    score_fn = make_score_fn(model, strategy="margin_sampling", n_classes=4,
                             mean=[0.5] * 3, std=[0.25] * 3, n_pixels=1,
                             top_n_percent=0.0, reverse_order=False,
                             ignore_index=11, mc_n_steps=0)
    _, stats = score_fn(variables["params"], {},
                        {"x": x, "excluded": np.zeros((2, 8, 8), bool),
                         "y": np.zeros((2, 8, 8), np.int32)},
                        jax.random.PRNGKey(0))
    cov = np.asarray(stats["coverage"])
    assert np.isnan(cov).all()  # a single pick has no pairs

    class _A:  # minimal args for QueryStats
        dir_checkpoints = "/tmp/unused"
        n_classes = 4

    qs = QueryStats(_A())
    qs.update_batch({k: np.asarray(v) for k, v in stats.items()})
    assert np.isnan(qs.list_spatial_coverage).all()
    # mixed lists average the finite entries (nanmean)
    qs.list_spatial_coverage.append(3.0)
    assert np.isclose(np.nanmean(qs.list_spatial_coverage), 3.0)


def test_mc_dropout_committee_runs():
    import flax.linen as nn

    class TinyDrop(nn.Module):
        @nn.compact
        def __call__(self, x, train=False, mc_dropout_on=False, upsample=True):
            h = nn.Conv(8, (1, 1), name="c1")(x)
            h = nn.Dropout(0.5, deterministic=not (train or mc_dropout_on))(h)
            return {"pred": nn.Conv(4, (1, 1), name="cls")(h), "emb": h}

    model = TinyDrop()
    x = np.random.default_rng(0).integers(0, 255, (1, 6, 6, 3), dtype=np.uint8)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 6, 6, 3)), train=True)
    score_fn = make_score_fn(model, strategy="entropy", n_classes=4,
                             mean=[0.5] * 3, std=[0.25] * 3, n_pixels=3,
                             top_n_percent=0.0, reverse_order=False,
                             ignore_index=11, mc_n_steps=4)
    idx, stats = score_fn(variables["params"], {},
                          {"x": x, "excluded": np.zeros((1, 6, 6), bool),
                           "y": np.zeros((1, 6, 6), np.int32)},
                          jax.random.PRNGKey(0))
    assert np.asarray(idx).shape == (1, 3)


def test_mc_dropout_hard_vote():
    """Hard vote: uncertainty from the committee's argmax vote distribution.
    A dropout-free model votes identically every step -> margin 1 class
    fraction differences are 1.0 (fully certain) at every pixel, so with
    entropy strategy the vote entropy is exactly 0."""
    import flax.linen as nn

    class TinyDet(nn.Module):
        @nn.compact
        def __call__(self, x, train=False, mc_dropout_on=False, upsample=True):
            return {"pred": nn.Conv(4, (1, 1), name="cls")(x), "emb": x}

    model = TinyDet()
    x = np.random.default_rng(0).integers(0, 255, (1, 6, 6, 3), dtype=np.uint8)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 6, 3)))
    score_fn = make_score_fn(model, strategy="entropy", n_classes=4,
                             mean=[0.5] * 3, std=[0.25] * 3, n_pixels=3,
                             top_n_percent=0.0, reverse_order=False,
                             ignore_index=11, mc_n_steps=4, vote_type="hard")
    idx, stats = score_fn(variables["params"], {},
                          {"x": x, "excluded": np.zeros((1, 6, 6), bool),
                           "y": np.zeros((1, 6, 6), np.int32)},
                          jax.random.PRNGKey(0))
    assert np.asarray(idx).shape == (1, 3)

    # stochastic committee: hard vote must run and pick valid pixels
    class TinyDrop(nn.Module):
        @nn.compact
        def __call__(self, x, train=False, mc_dropout_on=False, upsample=True):
            h = nn.Conv(8, (1, 1), name="c1")(x)
            h = nn.Dropout(0.5, deterministic=not (train or mc_dropout_on))(h)
            return {"pred": nn.Conv(4, (1, 1), name="cls")(h), "emb": h}

    model2 = TinyDrop()
    v2 = model2.init({"params": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(1)},
                     jnp.zeros((1, 6, 6, 3)), train=True)
    score2 = make_score_fn(model2, strategy="margin_sampling", n_classes=4,
                           mean=[0.5] * 3, std=[0.25] * 3, n_pixels=3,
                           top_n_percent=0.0, reverse_order=False,
                           ignore_index=11, mc_n_steps=6, vote_type="hard")
    idx2, _ = score2(v2["params"], {},
                     {"x": x, "excluded": np.zeros((1, 6, 6), bool),
                      "y": np.zeros((1, 6, 6), np.int32)},
                     jax.random.PRNGKey(2))
    assert len(set(np.asarray(idx2)[0].tolist())) == 3


def test_select_topk_padded_pool_candidate_parity():
    """Bucket padding must not inflate the candidate pool: the reference
    computes k = int(h*w * top_n_percent) from the TRUE image area
    (query.py:36). A 10x10 image padded into a 16x16 bucket must draw its
    picks from the same top-k candidate set as the unpadded run, and never
    from the pad region."""
    rng = np.random.default_rng(7)
    h, w, bh, bw = 10, 10, 16, 16
    uc_true = rng.random((h, w)).astype(np.float32)  # entropy-like
    uc_pad = np.zeros((bh, bw), np.float32)
    uc_pad[:h, :w] = uc_true
    pad = np.ones((bh, bw), bool)
    pad[:h, :w] = False

    n_pixels, pct = 4, 0.2
    k_true = int(h * w * pct)  # 20
    # the true candidate set: top-20 scores of the true image
    order = np.argsort(uc_true.ravel())[::-1]
    cand = set(order[:k_true].tolist())

    for seed in range(5):
        idx_pad = np.asarray(_select_topk(
            jnp.asarray(uc_pad.ravel()), jax.random.PRNGKey(seed),
            strategy="entropy", n_pixels=n_pixels, top_n_percent=pct,
            reverse_order=False, hw=(bh, bw),
            pad_mask=jnp.asarray(pad.ravel()),
            true_n=jnp.int32(h * w)))
        assert len(set(idx_pad.tolist())) == n_pixels
        ys, xs = idx_pad // bw, idx_pad % bw
        assert (ys < h).all() and (xs < w).all(), "picked a pad pixel"
        # map bucket-flat -> true-flat and check candidate membership
        flat_true = ys * w + xs
        assert set(flat_true.tolist()) <= cand, (
            "pick outside the true-area top-k candidate set")


def test_select_topk_padded_random_strategy_stays_in_image():
    """The random strategy must never pick (or count candidates from) the
    pad region."""
    bh, bw, h, w = 12, 12, 6, 9
    uc = np.random.default_rng(0).random((bh, bw)).astype(np.float32)
    pad = np.ones((bh, bw), bool)
    pad[:h, :w] = False
    for seed in range(4):
        idx = np.asarray(_select_topk(
            jnp.asarray(uc.ravel()), jax.random.PRNGKey(seed),
            strategy="random", n_pixels=5, top_n_percent=0.3,
            reverse_order=False, hw=(bh, bw),
            pad_mask=jnp.asarray(pad.ravel()), true_n=jnp.int32(h * w)))
        ys, xs = idx // bw, idx % bw
        assert (ys < h).all() and (xs < w).all()


def test_select_topk_reverse_order_padded():
    """reverse_order: the random candidate subset is drawn among the TRUE
    image pixels only (reference samples over range(h*w), query.py:39)."""
    bh, bw, h, w = 12, 12, 8, 8
    uc = np.random.default_rng(1).random((bh, bw)).astype(np.float32)
    pad = np.ones((bh, bw), bool)
    pad[:h, :w] = False
    for seed in range(4):
        idx = np.asarray(_select_topk(
            jnp.asarray(uc.ravel()), jax.random.PRNGKey(seed),
            strategy="margin_sampling", n_pixels=3, top_n_percent=0.5,
            reverse_order=True, hw=(bh, bw),
            pad_mask=jnp.asarray(pad.ravel()), true_n=jnp.int32(h * w)))
        ys, xs = idx // bw, idx % bw
        assert (ys < h).all() and (xs < w).all()
        assert len(set(idx.tolist())) == 3


def test_score_fn_picked_valid_masks_spilled_picks():
    """An image with fewer candidates than n_pixels spills picks into
    excluded pixels; stats must flag them via picked_valid."""
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False, mc_dropout_on=False, upsample=True):
            return {"pred": nn.Conv(4, (1, 1), name="cls")(x), "emb": x}

    model = Tiny()
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (1, 6, 6, 3), dtype=np.uint8)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 6, 3)))
    excluded = np.ones((1, 6, 6), bool)
    excluded[0, 0, :3] = False  # only 3 pickable pixels, n_pixels=5
    score_fn = make_score_fn(model, strategy="margin_sampling", n_classes=4,
                             mean=[0.5] * 3, std=[0.25] * 3, n_pixels=5,
                             top_n_percent=0.0, reverse_order=False,
                             ignore_index=11)
    idx, stats = score_fn(variables["params"], {},
                          {"x": x, "excluded": excluded,
                           "y": np.zeros((1, 6, 6), np.int32)},
                          jax.random.PRNGKey(0))
    ok = np.asarray(stats["picked_valid"])[0]
    assert ok.sum() == 3
    picked = np.asarray(idx)[0]
    good = {int(i) for i, v in zip(picked, ok) if v}
    assert good == {0, 1, 2}
