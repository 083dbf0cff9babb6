"""Standalone validation — reference ``eval.py:14-134``: build the val set,
load a checkpoint, run a full evaluation pass, print mIoU/pixel-acc, write
``{dir_checkpoints}/val/log_val.txt`` and periodic 6-panel PNGs
(``eval.py:69-84``).

TPU-native execution: batches are sharded over the ``('data',)`` device
mesh exactly as the driver's validation is (``active/driver.py:_val``) — a
standalone eval on a pod runs data-parallel, not on one chip. Variable-size
datasets (VOC) run through the shape-bucketed batched loader (≤2 XLA
programs instead of one compile per image shape, reference pays a bs-1
forward per image at ``eval.py:49-60``); pad labels carry the ignore index
so the confusion matrix drops them. The periodic PNGs come from the eval
step's own outputs (``ops/uncertainty.py:vis_maps``) — no dedicated
visualisation forward pass exists.
"""

import os

import jax
import numpy as np

from pixelpick_tpu.config import Arguments
from pixelpick_tpu.data import get_dataset, Loader
from pixelpick_tpu.engine.checkpoint import load_checkpoint
from pixelpick_tpu.engine.trainer import make_eval_step
from pixelpick_tpu.models import get_model, init_model
from pixelpick_tpu.parallel.distributed import is_primary
from pixelpick_tpu.parallel.mesh import (
    get_mesh, pad_batch_to_devices, shard_batch,
)
from pixelpick_tpu.utils.metrics import RunningScore
from pixelpick_tpu.utils.logging import write_log
from pixelpick_tpu.active.driver import _pad_to_stride


def _write_vis(dataset_name, batch, off, vis, fp):
    """6-panel PNG of batch image ``off`` from the eval step's vis maps
    (reference eval.py:69-84 re-forwards instead). Panel assembly is
    shared with the driver's per-epoch PNGs (utils/visualiser.py). Every
    process computes ``vis``; only the primary writes (the batch itself is
    host NumPy, addressable everywhere)."""
    from pixelpick_tpu.utils.visualiser import Visualiser, render_vis_panels

    try:
        if not is_primary():
            return
        x0 = np.asarray(batch["x"][off:off + 1])[0]
        y = batch.get("y")
        target = np.asarray(y[off:off + 1])[0] if y is not None else None
        render_vis_panels(Visualiser(dataset_name), x0, target, vis, fp)
    except Exception as e:  # visualisation must never kill an eval
        print(f"visualisation failed: {e}")


def evaluate(args, params, batch_stats, loader=None, debug: bool = False,
             dir_vis: str = None, visualize_interval: int = 100):
    model = get_model(args)
    mesh = get_mesh(args)
    dataset_val = loader.dataset if loader else get_dataset(args, val=True)
    if loader is None:
        bucket = args.stride_total \
            if getattr(dataset_val, "variable_size", False) else None
        val_bs = getattr(args, "val_batch_size", 1)
        if mesh is not None:
            # TPU-first default: round the batch up to a device-count
            # multiple so the standalone eval runs data-parallel across the
            # mesh (identical metrics — the confusion matrix is additive
            # over images, and val loaders never drop a remainder image,
            # loader.py drop_last). Applies to the bucketed (VOC) loader — it
            # fills partial batches with fully-masked duplicates
            # (loader.py:174-185), so EVERY bucketed batch is full-size
            # and shards evenly; only the fixed-size loader's remainder
            # batch falls back to replication.
            val_bs = -(-val_bs // mesh.devices.size) * mesh.devices.size
        loader = Loader(dataset_val, val_bs,
                        mode="val", n_workers=args.n_workers,
                        bucket_stride=bucket, pad_label=args.ignore_index)
    eval_fn = make_eval_step(model, n_classes=args.n_classes,
                             mean=args.mean, std=args.std)
    if dir_vis:
        os.makedirs(dir_vis, exist_ok=True)
        if visualize_interval < loader.batch_size:
            # documented deviation (PARITY.md): vis maps are computed for
            # ONE image per eval step, so an interval smaller than the
            # (mesh-rounded) batch renders fewer PNGs than the reference's
            # per-image cadence (eval.py:74-84) — warn so it's no surprise
            print(f"WARNING: visualize_interval={visualize_interval} < "
                  f"batch_size={loader.batch_size}: at most one PNG per "
                  f"batch will be written (see PARITY.md, batched-eval "
                  f"PNG cadence)")
    score = RunningScore(args.n_classes)
    n_img = 0
    for batch in loader:
        # real (non-pad) images in this batch: the bucketed loader fills
        # partial batches with fully-masked duplicates carrying index=-1
        # (loader.py) — pads never advance the reference's per-image PNG
        # cadence (eval.py:74-84) and real images always precede pads
        if "index" in batch:
            n_real = int((np.asarray(batch["index"]) >= 0).sum())
        else:
            n_real = batch["x"].shape[0]
        # first global image index in this batch on the cadence, if any;
        # vis maps are computed for ONE image per step, so when the
        # interval is smaller than the batch only the first hit renders
        off = (-n_img) % visualize_interval
        hit = dir_vis is not None and off < n_real
        vis_index = off if hit else 0
        if getattr(loader, "bucket_stride", None) is not None:
            feed = {k: v for k, v in batch.items()
                    if k not in ("index", "hw")}
            feed = shard_batch(feed, mesh)
            hist, pred, vis = eval_fn(params, batch_stats, feed,
                                      vis_index=vis_index)
        elif args.dataset_name == "voc":
            padded, valid_hw = _pad_to_stride(batch, args.stride_total)
            # remainder batches pad to the full batch size with ignore-
            # labelled duplicate rows: sharded spec + one compiled program
            # for the whole sweep (mesh.py:pad_batch_to_devices)
            feed, _ = pad_batch_to_devices(padded, mesh,
                                           pad_label=args.ignore_index,
                                           target_rows=loader.batch_size)
            feed = shard_batch(feed, mesh)
            hist, pred, vis = eval_fn(params, batch_stats, feed,
                                      valid_hw=valid_hw, vis_index=vis_index)
        else:
            feed, _ = pad_batch_to_devices(batch, mesh,
                                           pad_label=args.ignore_index,
                                           target_rows=loader.batch_size)
            feed = shard_batch(feed, mesh)
            hist, pred, vis = eval_fn(params, batch_stats, feed,
                                      vis_index=vis_index)
        score.merge(hist)
        if hit:
            _write_vis(args.dataset_name, batch, off, vis,
                       f"{dir_vis}/{n_img + off}.png")
        n_img += n_real
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
    if is_primary():  # multi-process: one writer on the shared filesystem
        write_log(f"{dir_vis}/log_val.txt",
                  list_entities=[0, scores["Mean IoU"], scores["Pixel Acc"]],
                  header=["epoch", "miou", "pixel_acc"])
    print(scores)
    print("per-class IoU:", cls_iu)


if __name__ == "__main__":
    main()
