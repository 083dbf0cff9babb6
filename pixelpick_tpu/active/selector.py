"""QuerySelector — host orchestration of one acquisition round.

Public surface mirrors the reference (``query.py:12-221``):
``QuerySelector(args, loader)(nth_query, params/batch_stats, human_labels)``
returns the encoded query dict and, in oracle mode, labels the query
dataset's masks and dumps per-round stats.

The device work (forward, scoring, exclusion, top-k, stats) runs in the
batched jitted kernel from ``active/acquisition.py`` over pool batches,
instead of the reference's sequential batch-1 sweep (``query.py:158-212``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import numpy as np

from pixelpick_tpu.active import codec
from pixelpick_tpu.active.acquisition import make_score_fn
from pixelpick_tpu.active.stats import QueryStats
from pixelpick_tpu.parallel.distributed import LockstepJit, is_primary
from pixelpick_tpu.parallel.mesh import (
    pad_batch_to_devices, shard_batch, shard_batch_spatial,
)


class QuerySelector:
    def __init__(self, args, loader, model, mesh=None):
        self.args = args
        self.loader = loader  # mode='query' Loader over the pool
        self.model = model
        # pool images are independent — the sweep is embarrassingly parallel
        # over the ('data',) mesh (SURVEY §2.2); batches are sharded on the
        # leading axis and only (B, n_pixels) indices + small stats return.
        # --spatial_query_sharding shards HEIGHT stripes instead (model
        # parallelism for large-image/small-pool regimes)
        self.mesh = mesh
        self._shard = shard_batch_spatial \
            if getattr(args, "spatial_query_sharding", False) else shard_batch
        self.n_pixels_by_us = args.n_pixels_by_us
        self.ignore_index = args.ignore_index
        self.dir_checkpoints = args.dir_checkpoints
        self.seed = args.seed
        self._score_fn = make_score_fn(
            model,
            strategy=args.query_strategy,
            n_classes=args.n_classes,
            mean=args.mean, std=args.std,
            n_pixels=args.n_pixels_by_us,
            top_n_percent=args.top_n_percent,
            reverse_order=args.reverse_order,
            ignore_index=args.ignore_index,
            mc_n_steps=args.mc_n_steps if args.use_mc_dropout else 0,
            vote_type=args.vote_type,
        )
        # multi-host: align processes around the sweep kernel's first
        # dispatch (communicator bootstrap vs compile skew); no-op otherwise
        self._score_fn = LockstepJit(self._score_fn, "score")

    def __call__(self, nth_query: int, params, batch_stats,
                 human_labels: bool = False) -> Dict[str, dict]:
        print(f"Choosing pixels by {self.args.query_strategy}")
        stats = QueryStats(self.args)
        dict_queries: Dict[str, dict] = {}
        rng = jax.random.PRNGKey((self.seed * 1_000_003 + nth_query) & 0x7FFFFFFF)

        n_pixels_total = 0
        sample_idx = 0
        ds = self.loader.dataset
        for batch in self.loader:
            rng, sub = jax.random.split(rng)
            if "index" not in batch:
                # fixed-size loaders yield in dataset order — materialise
                # the identity so remainder padding below can mark its
                # duplicate rows with -1 (the bucketed-loader convention)
                batch["index"] = np.arange(
                    sample_idx, sample_idx + batch["x"].shape[0],
                    dtype=np.int32)
            # remainder pool batches pad to the FULL batch size with
            # excluded=True duplicate rows (index=-1, skipped below): the
            # sweep shards every batch AND compiles exactly one program
            # per bucket (a second remainder-shape compile costs 1-5 min
            # on the tunnelled TPU stack)
            batch, n_real = pad_batch_to_devices(
                batch, self.mesh, target_rows=self.loader.batch_size)
            # "hw" (per-image true sizes) rides into the kernel: candidate-
            # pool size is computed from the true area and bucket padding is
            # never pickable (reference query.py:36 uses the true h*w)
            score_in = {k: v for k, v in batch.items() if k != "index"}
            score_in = self._shard(score_in, self.mesh)
            indices, dev_stats = self._score_fn(params, batch_stats,
                                                score_in, sub)
            if jax.process_count() > 1:
                # multi-host: kernel outputs are sharded over all hosts'
                # devices; gather them so every process sees (and labels)
                # the full global pick set identically
                from jax.experimental import multihost_utils as mhu
                indices = mhu.process_allgather(indices, tiled=True)
                dev_stats = {k: mhu.process_allgather(v, tiled=True)
                             for k, v in dev_stats.items()}
            indices = np.asarray(indices)  # (B, n_pixels) flat
            bsz = indices.shape[0]
            valid_rows = []
            for b in range(bsz):
                # every batch carries dataset indices here (-1 = batch-fill
                # or remainder-pad duplicate, skipped)
                i = int(batch["index"][b])
                if i < 0:
                    continue
                valid_rows.append(b)
                h, w = batch["x"].shape[1:3]
                q = np.zeros(h * w, bool)
                q[indices[b]] = True
                q = q.reshape(h, w)
                if "hw" in batch:  # crop bucket padding back off
                    h, w = (int(v) for v in batch["hw"][b])
                    q = q[:h, :w]
                n_pixels_total += int(q.sum())
                dict_queries.update(codec.encode_query(
                    ds.list_inputs[i], (h, w), q))
            if not human_labels:
                if len(valid_rows) != bsz:
                    dev_stats = {k: np.asarray(v)[valid_rows]
                                 for k, v in dev_stats.items()}
                stats.update_batch(dev_stats)
            sample_idx += n_real

        assert len(dict_queries) > 0, "no queries are chosen!"
        if not human_labels:
            if is_primary():
                stats.save(nth_query)
            print(f"{n_pixels_total} labelled pixels are chosen by "
                  f"{self.args.query_strategy} strategy")
            # keep the pool dataset's masks in sync (query.py:220). Deviation
            # from the reference: we pass nth_query=None so the picks are NOT
            # dumped to {nth}_query/queries.pkl here — the reference's dump
            # overwrites the round's existing queries.pkl (for round 0: the
            # initial-query cache, camvid.py:55), losing those pixels from
            # disk and breaking artifact-based resume. The driver still dumps
            # the picks at {nth+1}_query/queries.pkl (model.py:84).
            ds.label_queries(dict_queries, None)
        return dict_queries
