"""Optimizers and LR schedules as optax transforms.

Reproduces the reference's optimizer factory semantics
(``/root/reference/utils/utils.py:112-306``) — per-module parameter groups
with the backbone/encoder at lr/10 (Adam) or hardcoded SGD rates — and its
two schedules (``utils/lr_scheduler.py:4-21`` Poly, ``utils/utils.py:312``
MultiStepLR), re-expressed as pure optax schedules over the global step
count so the whole update rule jits into the train step.

Weight decay is *coupled* L2 (added to the gradient before the moment
update), matching ``torch.optim.Adam/SGD(weight_decay=...)``.

Schedule timing notes (verified against the reference's call pattern):

- Poly is stepped per iteration (``model.py:138-139``); the k-th optimizer
  step (0-based) uses ``factor = (1 - k / N) ** 0.9`` with
  ``N = n_epochs * iters_per_epoch``.
- MultiStepLR(milestones=[20, 40], gamma=0.1) is stepped once per epoch with
  an explicit lagging epoch argument (``model.py:144-145`` passes
  ``epoch - 1``), so the decade drops take effect at the start of epochs 22
  and 42 (1-indexed) — reproduced exactly.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax


def poly_factor(n_epochs: int, iters_per_epoch: int, power: float = 0.9) -> Callable:
    total = n_epochs * iters_per_epoch

    def factor(step):
        # (total - t) / total rather than 1 - t/total: avoids f32 cancellation
        # near the end of training where the factor approaches 0
        frac = (total - jnp.minimum(step, total)).astype(jnp.float32) / total
        return frac ** power

    return factor


def multistep_factor(iters_per_epoch: int, milestones=(20, 40), gamma: float = 0.1) -> Callable:
    def factor(step):
        epoch = step // iters_per_epoch + 1  # 1-indexed current epoch
        n_drops = sum([(epoch >= m + 2).astype(jnp.int32) for m in milestones])
        return gamma ** n_drops.astype(jnp.float32)

    return factor


def schedule_factor(args, iters_per_epoch: int) -> Callable:
    if args.lr_scheduler_type == "Poly":
        return poly_factor(args.n_epochs, iters_per_epoch)
    if args.lr_scheduler_type == "MultiStepLR":
        return multistep_factor(iters_per_epoch)
    raise ValueError(args.lr_scheduler_type)


# Per-dataset parameter-group table. Mirrors utils/utils.py:112-306:
# every dataset uses {backbone-at-low-lr, heads-at-base-lr}; SGD variants use
# hardcoded rates (ignoring optimizer_params["lr"]), Adam variants use
# optimizer_params with backbone lr/10.
def param_group_table(args) -> Dict[str, dict]:
    p = args.optimizer_params
    if args.optimizer_type == "Adam":
        base = dict(opt="adam", betas=p.get("betas", (0.9, 0.999)),
                    eps=p.get("eps", 1e-7), wd=p.get("weight_decay", 0.0))
        return {
            "backbone": dict(base, lr=p["lr"] / 10),
            "heads": dict(base, lr=p["lr"]),
        }
    if args.optimizer_type == "SGD":
        # the SGD table hardcodes wd=5e-4 (utils.py:147-175,221-239) except
        # the VOC FPN branch which uses 1e-4 (utils.py:211-219)
        wd = 1e-4 if (args.dataset_name == "voc" and args.network_name == "FPN") else 5e-4
        base = dict(opt="sgd", momentum=p.get("momentum", 0.9), wd=wd)
        return {
            "backbone": dict(base, lr=1e-3),
            "heads": dict(base, lr=1e-2),
        }
    raise ValueError(args.optimizer_type)


BACKBONE_KEYS = ("backbone", "encoder")


def _group_transform(cfg: dict, factor: Callable) -> optax.GradientTransformation:
    if cfg["opt"] == "adam":
        scale = optax.scale_by_adam(b1=cfg["betas"][0], b2=cfg["betas"][1],
                                    eps=cfg["eps"])
    else:
        scale = optax.trace(decay=cfg["momentum"], nesterov=False)
    return optax.chain(
        optax.add_decayed_weights(cfg["wd"]),
        scale,
        optax.scale_by_schedule(lambda step: -cfg["lr"] * factor(step)),
    )


def label_params(params) -> dict:
    """Label each top-level param subtree 'backbone' or 'heads'."""
    return {
        k: jax.tree.map(lambda _: "backbone" if k in BACKBONE_KEYS else "heads", v)
        for k, v in params.items()
    }


def make_optimizer(args, params, iters_per_epoch: int) -> optax.GradientTransformation:
    factor = schedule_factor(args, iters_per_epoch)
    table = param_group_table(args)
    txs = {name: _group_transform(cfg, factor) for name, cfg in table.items()}
    return optax.multi_transform(txs, param_labels=label_params(params))
