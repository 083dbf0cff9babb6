"""Standalone validation — reference ``eval.py:14-134``: build the val set,
load a checkpoint, run a full evaluation pass, print mIoU/pixel-acc, write
``{dir_checkpoints}/val/log_val.txt`` and periodic 6-panel PNGs
(``eval.py:69-84``).

TPU-native execution: variable-size datasets (VOC) run through the
shape-bucketed batched loader (≤2 XLA programs instead of one compile per
image shape, reference pays a bs-1 forward per image at ``eval.py:49-60``);
pad labels carry the ignore index so the confusion matrix drops them.
"""

import os

import jax
import numpy as np

from pixelpick_tpu.config import Arguments
from pixelpick_tpu.data import get_dataset, Loader
from pixelpick_tpu.engine.checkpoint import load_checkpoint
from pixelpick_tpu.engine.trainer import make_eval_step, make_forward_fn
from pixelpick_tpu.models import get_model, init_model
from pixelpick_tpu.utils.metrics import RunningScore
from pixelpick_tpu.utils.logging import write_log
from pixelpick_tpu.active.driver import _pad_to_stride


def _visualise(forward, params, batch_stats, batch, pred_row, fp):
    """6-panel PNG of image 0 of a batch (reference eval.py:69-84)."""
    from pixelpick_tpu.active.acquisition import uncertainty_map
    from pixelpick_tpu.utils.visualiser import Visualiser
    import jax.numpy as jnp

    try:
        x = np.asarray(batch["x"][:1])
        out = forward(params, batch_stats, x)
        prob = jax.nn.softmax(out["pred"].astype(jnp.float32), -1)
        ent = np.asarray(uncertainty_map(prob, "entropy"))[0]
        lc = np.asarray(uncertainty_map(prob, "least_confidence"))[0]
        ms = np.asarray(uncertainty_map(prob, "margin_sampling"))[0]
        y = batch.get("y")
        Visualiser(_visualise.dataset_name)(
            {"input": x[0], "target": np.asarray(y)[0] if y is not None
             else None, "pred": np.asarray(pred_row),
             "confidence": lc, "margin": -ms, "entropy": ent}, fp=fp)
    except Exception as e:  # visualisation must never kill an eval
        print(f"visualisation failed: {e}")


_visualise.dataset_name = "cv"


def evaluate(args, params, batch_stats, loader=None, debug: bool = False,
             dir_vis: str = None, visualize_interval: int = 100):
    model = get_model(args)
    dataset_val = loader.dataset if loader else get_dataset(args, val=True)
    if loader is None:
        bucket = args.stride_total \
            if getattr(dataset_val, "variable_size", False) else None
        loader = Loader(dataset_val, getattr(args, "val_batch_size", 1),
                        mode="val", n_workers=args.n_workers,
                        bucket_stride=bucket, pad_label=args.ignore_index)
    eval_fn = make_eval_step(model, n_classes=args.n_classes,
                             mean=args.mean, std=args.std)
    forward = make_forward_fn(model, mean=args.mean, std=args.std)
    _visualise.dataset_name = args.dataset_name
    if dir_vis:
        os.makedirs(dir_vis, exist_ok=True)
    score = RunningScore(args.n_classes)
    n_img = 0
    for batch in loader:
        if getattr(loader, "bucket_stride", None) is not None:
            feed = {k: v for k, v in batch.items()
                    if k not in ("index", "hw")}
            hist, pred = eval_fn(params, batch_stats, feed)
        elif args.dataset_name == "voc":
            batch, valid_hw = _pad_to_stride(batch, args.stride_total)
            hist, pred = eval_fn(params, batch_stats, batch,
                                 valid_hw=valid_hw)
        else:
            hist, pred = eval_fn(params, batch_stats, batch)
        score.merge(hist)
        if dir_vis and (n_img % visualize_interval) == 0:
            _visualise(forward, params, batch_stats, batch,
                       np.asarray(pred)[0], f"{dir_vis}/{n_img}.png")
        n_img += batch["x"].shape[0]
        if debug:
            break
    return score.get_scores()


def main():
    args = Arguments().parse_args()
    model = get_model(args)
    dataset_val = get_dataset(args, val=True)
    sample = dataset_val.val_sample(0)
    params, batch_stats = init_model(model, jax.random.PRNGKey(args.seed),
                                     sample["x"].shape[:2])
    if args.p_state_dict:
        params, batch_stats = load_checkpoint(args.p_state_dict, params, batch_stats)
        print(f"checkpoint loaded from {args.p_state_dict}")
    dir_vis = f"{args.dir_checkpoints}/val"
    scores, cls_iu = evaluate(
        args, params, batch_stats, debug=args.debug, dir_vis=dir_vis,
        visualize_interval=getattr(args, "visualize_interval", 100))
    write_log(f"{dir_vis}/log_val.txt",
              list_entities=[0, scores["Mean IoU"], scores["Pixel Acc"]],
              header=["epoch", "miou", "pixel_acc"])
    print(scores)
    print("per-class IoU:", cls_iu)


if __name__ == "__main__":
    main()
