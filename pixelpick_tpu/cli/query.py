"""Standalone query selection from a trained checkpoint — reference
``query.py:354-437`` ``__main__``: merge all previous rounds' query files,
rebuild the pool dataset over the annotated images, run the acquisition
engine in human-labels mode, and dump ``{nth}_query/queries.pkl`` for the
annotation tools."""

import os
import pickle as pkl

import jax

from pixelpick_tpu.active.codec import (
    gather_previous_query_files, merge_previous_query_files,
)
from pixelpick_tpu.active.selector import QuerySelector
from pixelpick_tpu.config import Arguments
from pixelpick_tpu.data import get_dataset, Loader
from pixelpick_tpu.engine.checkpoint import load_checkpoint
from pixelpick_tpu.models import get_model, init_model


def main():
    args = Arguments().parse_args()
    if not args.p_state_dict:
        raise SystemExit("--p_state_dict is required for standalone querying")

    model = get_model(args)
    dataset = get_dataset(args, val=False, query=True,
                          generate_init_queries=False)
    params, batch_stats = init_model(model, jax.random.PRNGKey(args.seed),
                                     dataset.crop_size if dataset.crop_size[0]
                                     else dataset.query_sample(0)["x"].shape[:2])
    params, batch_stats = load_checkpoint(args.p_state_dict, params, batch_stats)
    print(f"pretrained model loaded from {args.p_state_dict}")

    prev_files = gather_previous_query_files(args.dir_checkpoints)
    merged = merge_previous_query_files(prev_files, ignore_index=args.ignore_index)

    # restrict the pool to annotated images, paths rewritten to the dataset
    # dir (reference query.py:388-410)
    list_inputs, list_merged = [], []
    for p_img, m in sorted(merged.items()):
        p = f"{args.dir_dataset}/train/{os.path.basename(p_img)}"
        assert os.path.exists(p), p
        list_inputs.append(p)
        list_merged.append(m)
    dataset.list_inputs = list_inputs
    dataset.update_labelled_queries(list_merged)

    # variable-size pools (VOC) run bucketed: mixed shapes batch into <=2
    # padded XLA programs (driver parity; reference sweeps bs-1 per image)
    bucket = args.stride_total \
        if getattr(dataset, "variable_size", False) else None
    loader = Loader(dataset, args.pool_batch_size, mode="query",
                    n_workers=args.n_workers, human_labels=True,
                    bucket_stride=bucket, pad_label=args.ignore_index)
    nth_query = len(prev_files)
    from pixelpick_tpu.parallel.mesh import get_mesh, shard_pytree

    mesh = get_mesh(args)  # --data_parallel / --spatial_query_sharding
    params = shard_pytree(params, mesh)
    batch_stats = shard_pytree(batch_stats, mesh)
    qs = QuerySelector(args, loader, model, mesh=mesh)
    dict_queries = qs(nth_query=nth_query, params=params,
                      batch_stats=batch_stats, human_labels=True)
    from pixelpick_tpu.parallel.distributed import is_primary

    if is_primary():  # multi-host: one writer on a shared filesystem
        d = f"{args.dir_checkpoints}/{nth_query}_query"
        os.makedirs(d, exist_ok=True)
        with open(f"{d}/queries.pkl", "wb") as f:
            pkl.dump(dict_queries, f)
        print(f"Queries are saved at {d}/queries.pkl")


if __name__ == "__main__":
    main()
