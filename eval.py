"""Standalone validation — reference ``eval.py:97-134``: build the val set,
load a checkpoint, run a full evaluation pass, print mIoU/pixel-acc."""

import jax

from pixelpick_tpu.config import Arguments
from pixelpick_tpu.data import get_dataset, Loader
from pixelpick_tpu.engine.checkpoint import load_checkpoint
from pixelpick_tpu.engine.trainer import make_eval_step
from pixelpick_tpu.models import get_model, init_model
from pixelpick_tpu.utils.metrics import RunningScore
from pixelpick_tpu.active.driver import _pad_to_stride


def evaluate(args, params, batch_stats, loader=None, debug: bool = False):
    model = get_model(args)
    dataset_val = loader.dataset if loader else get_dataset(args, val=True)
    loader = loader or Loader(dataset_val, 1, mode="val",
                              n_workers=args.n_workers)
    eval_fn = make_eval_step(model, n_classes=args.n_classes,
                             mean=args.mean, std=args.std)
    score = RunningScore(args.n_classes)
    for batch in loader:
        if args.dataset_name == "voc":
            batch, valid_hw = _pad_to_stride(batch, args.stride_total)
            hist, _ = eval_fn(params, batch_stats, batch, valid_hw=valid_hw)
        else:
            hist, _ = eval_fn(params, batch_stats, batch)
        score.merge(hist)
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
    scores, cls_iu = evaluate(args, params, batch_stats, debug=args.debug)
    print(scores)
    print("per-class IoU:", cls_iu)


if __name__ == "__main__":
    main()
