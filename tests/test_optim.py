"""Optimizer/schedule parity against torch.optim on toy params."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import torch

from pixelpick_tpu.config import default_args
from pixelpick_tpu.engine.optim import (
    make_optimizer, poly_factor, multistep_factor, param_group_table,
)


def test_poly_factor_matches_reference_formula():
    f = poly_factor(n_epochs=50, iters_per_epoch=92)
    n = 50 * 92
    for t in [0, 1, 100, n - 1]:
        assert np.isclose(float(f(jnp.asarray(t))), ((n - t) / n) ** 0.9, rtol=1e-4)
    assert float(f(jnp.asarray(n))) == 0.0


def test_multistep_drops_at_epochs_22_and_42():
    ipe = 10
    f = multistep_factor(ipe)
    # epoch e occupies steps (e-1)*ipe .. e*ipe-1
    assert np.isclose(float(f(jnp.asarray(0))), 1.0)
    assert np.isclose(float(f(jnp.asarray(20 * ipe))), 1.0)    # epoch 21
    assert np.isclose(float(f(jnp.asarray(21 * ipe))), 0.1)    # epoch 22
    assert np.isclose(float(f(jnp.asarray(41 * ipe))), 0.01)   # epoch 42


def test_param_group_table_cv_adam():
    args = default_args("cv")
    t = param_group_table(args)
    assert t["backbone"]["lr"] == 5e-5 and t["heads"]["lr"] == 5e-4
    assert t["backbone"]["wd"] == 2e-4 and t["backbone"]["opt"] == "adam"


def test_param_group_table_voc_sgd():
    args = default_args("voc")
    t = param_group_table(args)
    assert t["backbone"]["lr"] == 1e-3 and t["heads"]["lr"] == 1e-2
    assert t["backbone"]["wd"] == 5e-4 and t["backbone"]["opt"] == "sgd"
    args_fpn = default_args("voc", network_name="FPN")
    assert param_group_table(args_fpn)["heads"]["wd"] == 1e-4


def _run_steps_jax(args, params, grads_seq, ipe=100):
    tx = make_optimizer(args, params, iters_per_epoch=ipe)
    state = tx.init(params)
    for g in grads_seq:
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    return params


def _run_steps_torch(groups, params_np, grads_seq, opt_cls, lr_lambda=None, **kw):
    tensors = {k: torch.tensor(v, requires_grad=True) for k, v in params_np.items()}
    param_groups = [dict(params=[tensors[k]], **groups[k]) for k in tensors]
    opt = opt_cls(param_groups, **kw)
    for g in grads_seq:
        for k in tensors:
            tensors[k].grad = torch.tensor(g[k])
        opt.step()
    return {k: v.detach().numpy() for k, v in tensors.items()}


def test_adam_with_param_groups_matches_torch():
    """End-to-end: CamVid Adam (backbone lr/10, coupled wd 2e-4, eps 1e-7)
    against torch.optim.Adam with the same groups, constant schedule."""
    args = default_args("cv")
    args.lr_scheduler_type = "MultiStepLR"  # constant during first epochs
    rng = np.random.default_rng(0)
    params = {"backbone": {"w": jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))},
              "seg_head": {"w": jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))}}
    grads_seq = [
        {"backbone": {"w": jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))},
         "seg_head": {"w": jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))}}
        for _ in range(5)
    ]
    out = _run_steps_jax(args, params, grads_seq)

    torch_groups = {"backbone": dict(lr=5e-5), "seg_head": dict(lr=5e-4)}
    params_np = {k: np.asarray(v["w"]) for k, v in params.items()}
    grads_np = [{k: np.asarray(g[k]["w"]) for k in g} for g in grads_seq]
    ref = _run_steps_torch(torch_groups, params_np, grads_np, torch.optim.Adam,
                           betas=(0.9, 0.999), weight_decay=2e-4, eps=1e-7)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]["w"]), ref[k], rtol=2e-5, atol=2e-6)


def test_sgd_momentum_matches_torch():
    args = default_args("voc")
    args.lr_scheduler_type = "MultiStepLR"
    rng = np.random.default_rng(1)
    params = {"backbone": {"w": jnp.asarray(rng.standard_normal(6).astype(np.float32))},
              "aspp": {"w": jnp.asarray(rng.standard_normal(6).astype(np.float32))}}
    grads_seq = [
        {"backbone": {"w": jnp.asarray(rng.standard_normal(6).astype(np.float32))},
         "aspp": {"w": jnp.asarray(rng.standard_normal(6).astype(np.float32))}}
        for _ in range(4)
    ]
    out = _run_steps_jax(args, params, grads_seq)
    torch_groups = {"backbone": dict(lr=1e-3), "aspp": dict(lr=1e-2)}
    params_np = {k: np.asarray(v["w"]) for k, v in params.items()}
    grads_np = [{k: np.asarray(g[k]["w"]) for k in g} for g in grads_seq]
    ref = _run_steps_torch(torch_groups, params_np, grads_np, torch.optim.SGD,
                           momentum=0.9, weight_decay=5e-4)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]["w"]), ref[k], rtol=2e-5, atol=2e-6)
