"""The active-learning driver — reference ``model.py:14 Model``.

Round loop (``model.py:53-91``): for each of ``max_budget // n_pixels_by_us``
stages — train a *fresh* model for ``n_epochs`` with per-epoch validation and
best-mIoU checkpointing, sweep the unlabelled pool for the next pixel batch,
oracle-label it, merge into the query masks, dump per-round artifacts
(``queries.pkl``, ``query_stats.pkl``, CSV logs, 6-panel PNGs). Fully
supervised mode when ``n_pixels_by_us == 0``.

TPU-native execution: the epoch is a host loop over jitted fused steps with
device-resident metric accumulation; validation and pool scoring are
batched jitted programs (see engine/trainer.py, active/acquisition.py).
"""

from __future__ import annotations

import os
import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pixelpick_tpu.active.selector import QuerySelector
from pixelpick_tpu.data import get_dataset, Loader
from pixelpick_tpu.engine.checkpoint import save_checkpoint
from pixelpick_tpu.engine.optim import make_optimizer
from pixelpick_tpu.engine.trainer import (
    TrainState, create_train_state, make_dense_train_step, make_eval_step,
    make_microbatch_train_step, make_train_step,
)
from pixelpick_tpu.models import get_model, init_model
from pixelpick_tpu.parallel.distributed import LockstepJit, is_primary
from pixelpick_tpu.parallel.mesh import (
    get_mesh, pad_batch_to_devices, shard_batch,
)
from pixelpick_tpu.utils.logging import write_log
from pixelpick_tpu.utils.metrics import AverageMeter, RunningScore
from pixelpick_tpu.utils.profiling import PhaseTimer, trace
from pixelpick_tpu.utils.visualiser import Visualiser, render_vis_panels


class ALModel:
    def __init__(self, args, human_labels: bool = False,
                 human_inputs=None, human_maps=None):
        """``human_inputs``/``human_maps``: the merged human-labelled image
        paths and per-image label maps (cli/train.py resume path,
        reference train.py:204-236) — wired through the constructor so the
        dataset is re-pointed BEFORE loaders compute their batch plans
        (post-hoc ``list_inputs`` mutation left drop-last/lengths stale and
        the GT label list positionally misaligned)."""
        self.args = args
        self.debug = args.debug
        self.dir_checkpoints = args.dir_checkpoints
        self.experim_name = args.experim_name
        self.human_labels = human_labels
        self.best_miou = -1.0
        self.nth_query = -1

        self.dataset = get_dataset(args, val=False, query=False)
        self.dataset_query = get_dataset(args, val=False, query=True,
                                         generate_init_queries=False)
        if human_inputs is not None:
            assert human_labels, "human_inputs requires human_labels=True"
            self.dataset.set_human_inputs(human_inputs, human_maps)
            self.dataset_query.set_human_inputs(human_inputs, human_maps)
        else:
            self.dataset_query.queries = self.dataset.queries  # shared masks
            self.dataset_query.n_pixels_total = self.dataset.n_pixels_total
        self.dataset_val = get_dataset(args, val=True, query=False)

        fully_sup = args.n_pixels_by_us == 0
        self.mesh = get_mesh(args)
        self.loader = Loader(self.dataset, args.batch_size,
                             mode="train_dense" if fully_sup else "train",
                             shuffle=True, n_workers=args.n_workers,
                             seed=args.seed, human_labels=human_labels,
                             drop_unit=self._micro_bs() or None)
        # variable-size datasets (VOC): bucket val/query shapes so the whole
        # sweep compiles ≤2 XLA programs per loader instead of one per image
        # shape (SURVEY §7 hard-part 5)
        bucket = args.stride_total \
            if getattr(self.dataset_val, "variable_size", False) else None
        self.loader_query = Loader(self.dataset_query, args.pool_batch_size,
                                   mode="query", shuffle=False,
                                   n_workers=args.n_workers, seed=args.seed,
                                   human_labels=human_labels,
                                   bucket_stride=bucket,
                                   pad_label=args.ignore_index)
        val_bs = getattr(args, "val_batch_size", 1)
        if self.mesh is not None:
            # TPU-first default, same rule as the standalone eval CLI
            # (cli/eval.py): round the per-epoch validation batch up to a
            # device multiple so it shards instead of running 50x per round
            # replicated at the configured (default 1) batch size; metrics
            # are unchanged — the confusion matrix is additive over images
            # and remainder batches are padded with ignore-labelled rows
            # (parallel/mesh.py:pad_batch_to_devices)
            val_bs = -(-val_bs // self.mesh.devices.size) \
                * self.mesh.devices.size
        self.loader_val = Loader(self.dataset_val, val_bs, mode="val",
                                 shuffle=False, n_workers=args.n_workers,
                                 bucket_stride=bucket,
                                 pad_label=args.ignore_index)

        self.model = get_model(args)
        self.device_pipe = None
        if getattr(args, "device_augment", False) and not fully_sup \
                and not human_labels:
            from pixelpick_tpu.data.device_pipeline import DevicePipeline
            self.device_pipe = DevicePipeline(self.dataset, args,
                                              mesh=self.mesh)
            # megabatch scans need micro-multiple rows; the pipeline pads
            # remainder batches on device (sample_batch n_real masking).
            # Device padding only when full batches shard — same rule as
            # _train_pad_multiple (BN-moment preservation for bs<devices)
            self.device_pipe.pad_multiple = self._micro_bs() or 1
            self.device_pipe.pad_to_devices = (
                self.mesh is not None
                and args.batch_size % self.mesh.devices.size == 0)
        self.vis = Visualiser(args.dataset_name)
        self.query_selector = QuerySelector(args, self.loader_query,
                                            self.model, mesh=self.mesh)
        self.running_loss = AverageMeter()

    def close(self) -> None:
        """Release the loaders' worker thread pools."""
        for ld in (self.loader, self.loader_query, self.loader_val):
            ld.close()

    # ----------------------------- rounds -----------------------------

    def __call__(self):
        args = self.args
        if args.n_pixels_by_us == 0:
            self._run_stage("fully_sup")
            return
        n_stages = args.max_budget // args.n_pixels_by_us
        n_stages += 1 if args.n_init_pixels > 0 else 0
        print("n_stages:", n_stages)
        for nth_query in range(n_stages):
            self.nth_query = nth_query
            # --resume_campaign: a round whose NEXT queries.pkl exists on
            # disk already ran to completion (the driver dumps picks at
            # {nth+1}_query at round end, model.py:84) — fast-forward by
            # merging the recorded picks instead of retraining. With
            # --stage_ckpt_interval this makes a whole crashed campaign
            # resumable: completed rounds skip, the interrupted stage
            # resumes mid-epoch-loop from its stage_state.ckpt.
            next_pkl = f"{self.dir_checkpoints}/{nth_query + 1}_query/queries.pkl"
            if getattr(args, "resume_campaign", False) \
                    and os.path.isfile(next_pkl):
                import pickle as pkl
                print(f"resume_campaign: round {nth_query} artifacts are "
                      f"complete — fast-forwarding past train/query")
                with open(next_pkl, "rb") as f:
                    picks = pkl.load(f)
                self.dataset.label_queries(picks, None)  # OR-merge, no dump
                if nth_query == n_stages - 1:
                    break
                continue
            params, batch_stats = self._run_stage(f"{nth_query}_query")
            profile_dir = getattr(args, "profile_dir", "")
            with trace(f"{profile_dir}/query" if profile_dir
                       and nth_query == 0 else None):
                queries = self.query_selector(nth_query, params, batch_stats,
                                              human_labels=self.human_labels)
            self.dataset.label_queries(queries, nth_query + 1)
            # the reference queries+labels BEFORE breaking on the last stage
            # (model.py:82-87), so {n_stages}_query/queries.pkl exists on disk
            # and resume-by-rglob counts rounds identically
            if nth_query == n_stages - 1:
                break

    def _run_stage(self, stage_name: str) -> Tuple:
        args = self.args
        dir_stage = f"{self.dir_checkpoints}/{stage_name}"
        os.makedirs(dir_stage, exist_ok=True)
        self.log_train = f"{dir_stage}/log_train.txt"
        self.log_val = f"{dir_stage}/log_val.txt"
        # --stage_ckpt_interval: resume an interrupted stage from its
        # mid-stage snapshot (full TrainState + epoch + best mIoU — the
        # reference never checkpoints optimizer state, model.py:207-216,
        # so a crash loses the whole 50-epoch stage)
        stage_ckpt = int(getattr(args, "stage_ckpt_interval", 0) or 0)
        p_stage_state = f"{dir_stage}/stage_state.ckpt"
        resuming = stage_ckpt > 0 and os.path.isfile(p_stage_state)
        # multi-host: every process runs the identical compute (collectives
        # need all participants) but only process 0 writes shared-filesystem
        # artifacts (parallel/distributed.py contract). On resume the
        # existing log rows are kept (headers would truncate).
        if is_primary() and not resuming:
            write_log(self.log_train,
                      header=["epoch", "mIoU", "pixel_acc", "loss"])
            write_log(self.log_val, header=["epoch", "mIoU", "pixel_acc"])

        # fresh model per round (model.py:163)
        round_seed = (args.seed * 7919 + self.nth_query + 1) & 0x7FFFFFFF
        params, batch_stats = init_model(
            self.model, jax.random.PRNGKey(round_seed), self.dataset.crop_size)
        if getattr(args, "pretrained_ckpt", ""):
            from pixelpick_tpu.models.convert import load_pretrained_ckpt
            params, batch_stats = load_pretrained_ckpt(
                params, batch_stats, args.pretrained_ckpt)
        fully_sup = args.n_pixels_by_us == 0
        micro = self._micro_bs()  # 0 in fully-supervised mode
        # LR schedules step per OPTIMIZER update: with microbatching each
        # loader batch carries ceil(rows/micro) updates, which lands the
        # Poly/MultiStep iteration count exactly on the reference's bs-4
        # step count (e.g. CamVid 367 @ bs48/micro4: 7x12 + 8 = 92 =
        # ceil(367/4) steps/epoch)
        if micro:
            sizes = [len(ix) for ix in self.loader.batch_index_plan(0)]
            iters_per_epoch = sum(-(-s // micro) for s in sizes)
        else:
            iters_per_epoch = len(self.loader)
        tx = make_optimizer(args, params, iters_per_epoch=iters_per_epoch)
        state = create_train_state(params, batch_stats, tx)

        if fully_sup:
            step_fn = make_dense_train_step(
                self.model, tx, n_classes=args.n_classes,
                ignore_index=args.ignore_index, mean=args.mean, std=args.std)
        elif micro:
            step_fn = make_microbatch_train_step(
                self.model, tx, micro_bs=micro, n_classes=args.n_classes,
                mean=args.mean, std=args.std,
                normalize=self.device_pipe is None)
        else:
            step_fn = make_train_step(
                self.model, tx, n_classes=args.n_classes,
                mean=args.mean, std=args.std,
                normalize=self.device_pipe is None)
        if self.device_pipe is not None:
            self.device_pipe.set_queries(self.dataset.queries)
        eval_fn = make_eval_step(self.model, n_classes=args.n_classes,
                                 mean=args.mean, std=args.std)
        # multi-host: compile-then-barrier around each program's first
        # dispatch so the cross-process communicator bootstrap (short fixed
        # timeout) never races compilation skew; single-process passthrough
        step_fn = LockstepJit(step_fn, f"step:{stage_name}")
        eval_fn = LockstepJit(eval_fn, f"eval:{stage_name}")

        self.best_miou = -1.0
        start_epoch = 1
        if resuming:
            from pixelpick_tpu.engine.checkpoint import load_stage_state
            state, done_epoch, self.best_miou = load_stage_state(
                p_stage_state, state)
            start_epoch = done_epoch + 1
            print(f"resuming {stage_name} from {p_stage_state}: epoch "
                  f"{start_epoch} (best mIoU so far {self.best_miou:.4f})")
        self.timer = PhaseTimer()
        rng = jax.random.PRNGKey(round_seed ^ 0x5EED)
        eval_interval = max(1, getattr(args, "eval_interval", 1))
        profile_dir = getattr(args, "profile_dir", "")
        # trace one steady-state epoch (epoch 2 skips compile noise) of the
        # first stage only; query-phase tracing is in __call__
        trace_epoch = min(2, args.n_epochs) if profile_dir \
            and self.nth_query <= 0 else -1
        for epoch in range(start_epoch, 1 + args.n_epochs):
            with self.timer.phase("train", len(self.dataset)), \
                    trace(f"{profile_dir}/train" if epoch == trace_epoch
                          else None):
                state, last_batch = self._train_epoch(epoch, state, step_fn,
                                                      rng)
            # per-epoch train PNG (model.py:150-158) — outside the timed
            # train phase (its own phase in timing.json), computed by the
            # EVAL program so no dedicated visualisation forward exists
            if last_batch is not None and not self.debug:
                with self.timer.phase("vis"):
                    self._visualise(eval_fn, state, last_batch,
                                    f"{dir_stage}/{epoch}_train.png")
            if epoch % eval_interval == 0 or epoch == args.n_epochs:
                with self.timer.phase("val", len(self.dataset_val)):
                    self._val(epoch, state, eval_fn, dir_stage)
            if stage_ckpt and epoch % stage_ckpt == 0 \
                    and epoch != args.n_epochs:
                # snapshot AFTER validation so best_miou is current; the
                # final epoch needs none (the stage is complete)
                with self.timer.phase("stage_ckpt"):
                    if is_primary():
                        from pixelpick_tpu.engine.checkpoint import \
                            save_stage_state
                        save_stage_state(p_stage_state, state, epoch,
                                         self.best_miou)
            if self.debug:
                break
        if stage_ckpt and is_primary():
            # stage complete: a later rerun must start fresh, not resume
            try:
                os.remove(p_stage_state)
            except FileNotFoundError:
                pass
        if is_primary():
            self.timer.dump(f"{dir_stage}/timing.json")
        if getattr(args, "ckpt_backend", "msgpack") == "orbax":
            from pixelpick_tpu.engine.checkpoint import wait_for_checkpoints
            wait_for_checkpoints()  # stage artifacts durable before querying
        return state.params, state.batch_stats

    # ----------------------------- epochs -----------------------------

    def _train_epoch(self, epoch: int, state: TrainState, step_fn, rng):
        args = self.args
        if args.n_pixels_by_us:
            print(f"training epoch {epoch} of {self.nth_query}th query "
                  f"({self.dataset.n_pixels_total} labelled pixels)")
        self.loader.set_epoch(epoch)
        score = RunningScore(args.n_classes)
        self.running_loss.reset()
        t0 = time.time()
        n_imgs = 0
        last_batch = None
        losses = []
        overflows = []
        pad_mult = self._train_pad_multiple()
        for batch in self._epoch_batches(epoch, rng):
            if self.device_pipe is None:
                # remainder batches (e.g. CamVid 367 % 48 = 31) pad to a
                # device multiple with valid=False rows so they shard
                # instead of replicating — loss and hist are mask-inert
                # (mesh.py:pad_batch_to_devices); with --micro_batch_size
                # the target is also a micro multiple so the scan reshapes
                b = batch["x"].shape[0]
                batch, n_real = pad_batch_to_devices(
                    batch, self.mesh, pad_label=self.args.ignore_index,
                    target_rows=-(-b // pad_mult) * pad_mult)
                batch = shard_batch(batch, self.mesh)
            else:
                n_real = batch.pop("n_real", batch["x"].shape[0])
            over = batch.pop("overflow", None)
            if over is not None:
                overflows.append(over)
            state, loss, hist = step_fn(state, batch, rng)
            score.merge(hist)
            losses.append(loss)
            n_imgs += n_real
            last_batch = batch
            if self.debug:
                break
        # drain the per-step device loss scalars once, at epoch end, as ONE
        # stacked fetch (a float() per step would be a host round-trip per
        # step on the tunnelled backend): the logged loss is the epoch
        # MEAN, matching the reference's per-iter running_loss.avg
        # (model.py:126,147) without mid-epoch host syncs
        if losses:
            # entries are scalars (one update/batch) or (n_micro,) vectors
            # (megabatch scan steps) — batch shapes can differ (remainder),
            # so stack per shape group: still <=2 host fetches per epoch,
            # and the epoch MEAN weights every optimizer update equally
            # (the per-iter semantics of the reference's running loss)
            groups = {}
            for loss in losses:
                groups.setdefault(getattr(loss, "shape", ()), []).append(loss)
            for group in groups.values():
                for v in np.asarray(jnp.stack(group)).ravel():
                    # NaN = the scan's all-pad-microbatch no-op sentinel
                    # (make_microbatch_train_step) — not an update, not
                    # averaged
                    if np.isfinite(v):
                        self.running_loss.update(float(v))
        if overflows:
            # device-path analogue of the host extractor's overflow warning
            # (data/base.py:SPARSE_OVERFLOW_COUNT): labelled pixels beyond
            # k_max would be silently dropped by top-k — surface it
            n_over = int(np.asarray(jnp.stack(overflows)).sum())
            if n_over:
                # same units as the host extractor (data/base.py): COUNT is
                # event-valued (one per epoch-with-overflow here), PIXELS
                # carries the dropped-pixel total
                import pixelpick_tpu.data.base as _base
                _base.SPARSE_OVERFLOW_COUNT += 1
                _base.SPARSE_OVERFLOW_PIXELS += n_over
                print(f"WARNING: device sparse extraction dropped {n_over} "
                      f"labelled pixels (crops exceeded k_max) this epoch — "
                      f"parity bug, raise k_max headroom")
        scores = score.get_scores()[0]
        miou, pixel_acc = scores["Mean IoU"], scores["Pixel Acc"]
        dt = time.time() - t0
        print(f"({self.experim_name}) Epoch {epoch} | mIoU: {miou:.3f} | "
              f"pixel acc: {pixel_acc:.3f} | loss: {self.running_loss.avg:.3f} "
              f"| {n_imgs / max(dt, 1e-9):.1f} imgs/s")
        if is_primary():
            write_log(self.log_train, list_entities=[
                epoch, miou, pixel_acc, self.running_loss.avg])
        return state, last_batch

    def _micro_bs(self) -> int:
        """--micro_batch_size (0 = one update per batch). Inert in
        fully-supervised mode (the dense step is a single update); must
        divide --batch_size so megabatches partition at exactly the
        reference's bs-micro boundaries."""
        micro = int(getattr(self.args, "micro_batch_size", 0) or 0)
        if not micro or self.args.n_pixels_by_us == 0:
            return 0
        if self.args.batch_size % micro != 0:
            raise ValueError(
                f"--micro_batch_size {micro} must divide --batch_size "
                f"{self.args.batch_size}: the megabatch scan partitions "
                f"each batch into whole micro-updates (the reference bs-"
                f"{micro} schedule); a non-divisor would pad every batch "
                f"with duplicate rows and change the BN moments")
        if self.mesh is not None and self.mesh.devices.size > micro \
                and not getattr(self, "_warned_micro_mesh", False):
            self._warned_micro_mesh = True
            print(f"WARNING: --micro_batch_size {micro} under a "
                  f"{self.mesh.devices.size}-device mesh: each sequential "
                  f"micro-update spans the whole mesh at <1 image/device — "
                  f"correct (tests/test_parallel.py) but degenerate "
                  f"parallelism; the trajectory-exact schedule is "
                  f"inherently update-serial")
        return micro

    def _train_pad_multiple(self) -> int:
        """Remainder train batches pad to a multiple of lcm(devices,
        micro_batch_size) so they both shard and reshape into the scan.

        Device padding applies ONLY when the loader's full batches shard
        (batch_size % n_devices == 0): then the only padded batch is the
        true remainder (e.g. CamVid 367 % 48 = 31 -> one dup row in 32).
        When batch_size itself doesn't divide the mesh (bs4 on 8 chips),
        padding EVERY batch with duplicates would distort its BN moments —
        those batches keep the replicated fallback instead (the reference
        semantics; the pre-padding behavior). An all-pad micro-update this
        padding can create (remainder below a device multiple) is a true
        no-op in the scan (trainer.py:make_microbatch_train_step)."""
        import math

        n = 1
        if self.mesh is not None \
                and self.args.batch_size % self.mesh.devices.size == 0:
            n = self.mesh.devices.size
        m = self._micro_bs()
        return math.lcm(n, m) if m else n

    def _epoch_batches(self, epoch: int, rng):
        """Host loader batches, or device-pipeline batches (index-only host
        work) when --device_augment is on."""
        if self.device_pipe is None:
            yield from self.loader
            return
        # the Loader's batch_index_plan is the single source of the shuffle
        # and drop-last rules — host-path and device-path runs share the
        # exact ordering for the same (seed, epoch)
        for bi, idxs in enumerate(self.loader.batch_index_plan(epoch)):
            key = jax.random.fold_in(rng, epoch * 100003 + bi)
            yield self.device_pipe.sample_batch(idxs, key)

    def _val(self, epoch: int, state: TrainState, eval_fn, dir_stage: str):
        args = self.args
        score = RunningScore(args.n_classes)
        last = None
        for batch in self.loader_val:
            if self.loader_val.bucket_stride is not None:
                # bucketed batches are already stride-padded; pad labels are
                # the ignore index, so the confusion matrix drops them
                feed = {k: v for k, v in batch.items()
                        if k not in ("index", "hw")}
                feed = shard_batch(feed, self.mesh)
                hist, pred, vis = eval_fn(state.params, state.batch_stats,
                                          feed)
            else:
                # variable-size datasets (VOC) always get a bucketed val
                # loader here (driver __init__), so every batch takes the
                # branch above; the per-batch _pad_to_stride path serves
                # externally-built loaders in cli/eval.py only.
                # Remainder batches pad to the FULL batch size with
                # ignore-labelled rows: they shard AND the whole epoch
                # reuses one compiled eval program
                batch, _ = pad_batch_to_devices(
                    batch, self.mesh, pad_label=self.args.ignore_index,
                    target_rows=self.loader_val.batch_size)
                batch = shard_batch(batch, self.mesh)
                hist, pred, vis = eval_fn(state.params, state.batch_stats,
                                          batch)
            score.merge(hist)
            last = (batch, vis)
            if self.debug:
                break
        scores = score.get_scores()[0]
        miou, pixel_acc = scores["Mean IoU"], scores["Pixel Acc"]

        if miou > self.best_miou:
            # every process tracks best_miou (identical global metrics).
            # msgpack: only the primary writes the file. orbax: EVERY
            # process must enter save() — orbax barriers all processes and
            # routes the writes/commit through the primary internally
            backend = getattr(args, "ckpt_backend", "msgpack")
            if backend == "orbax" or is_primary():
                save_checkpoint(f"{dir_stage}/best_miou_model.ckpt",
                                state.params, state.batch_stats,
                                backend=backend)
            print(f"best model saved (epoch {epoch} | prev miou "
                  f"{self.best_miou:.4f} => {miou:.4f})")
            self.best_miou = miou
        if is_primary():
            write_log(self.log_val, list_entities=[epoch, miou, pixel_acc])
        print(f"\n{'=' * 80}\nExperim name: {self.experim_name}\n"
              f"Epoch {epoch} | miou: {miou:.3f} | pixel_acc: {pixel_acc:.3f}\n"
              f"{'=' * 80}\n")
        if last is not None and not args.debug:
            batch, vis = last
            # the PNG comes straight from the eval step's outputs — zero
            # extra forward passes for the per-epoch val visualisation
            try:
                x0, target = self._image0(batch)
            except Exception as e:  # never kill a round over a PNG;
                print(f"visualisation failed: {e}")  # process-uniform
            else:
                self._write_vis(x0, target, vis,
                                f"{dir_stage}/{epoch}_val.png")

    def _image0(self, batch):
        """(uint8 image 0, target 0 or None) of a batch. Slices to image 0
        BEFORE fetching. Under multi-host the [:1] slice of a data-sharded
        global array may be addressable on ONE process only — np.asarray
        would then raise on the others but succeed there, a process-
        DIVERGENT failure that could leave the succeeding process alone in
        the lockstep eval dispatch that follows (`_visualise`). All
        processes therefore fetch through process_allgather, which is
        collective: they all get the value, or all raise together."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            def fetch(a):
                return np.asarray(
                    multihost_utils.process_allgather(a, tiled=True))
        else:
            fetch = np.asarray
        x = fetch(batch["x"][:1])
        if np.issubdtype(x.dtype, np.floating):
            # device-pipeline batches are already normalised; undo for
            # display and for the uint8 eval feed
            x = np.clip((x * np.asarray(self.args.std)
                         + np.asarray(self.args.mean)) * 255.0,
                        0, 255).astype(np.uint8)
        y = batch.get("y")
        target = fetch(y[:1])[0] if y is not None else None
        return x[0], target

    def _visualise(self, eval_fn, state: TrainState, batch, fp: str) -> None:
        """6-panel PNG from image 0 of a TRAIN batch (model.py:150-158),
        computed by the EVAL program — no dedicated visualisation forward
        function exists (the reference re-forwards per PNG; a separate
        jitted bs-1 full-upsample program used to cost an extra 1-5 min TPU
        compile per run). For fixed-size datasets the bs-1 feed compiles
        once and is reused by every epoch's train PNG."""
        try:
            x0, target = self._image0(batch)
            y0 = target if target is not None \
                else np.zeros(x0.shape[:2], np.int32)
            feed = {"x": x0[None], "y": np.asarray(y0, np.int32)[None]}
            _, _, vis = eval_fn(state.params, state.batch_stats, feed)
            self._write_vis(x0, target, vis, fp)
        except Exception as e:  # visualisation must never kill a round
            print(f"visualisation failed: {e}")

    def _write_vis(self, x0, target, vis, fp: str) -> None:
        """Render the 6 panels from an eval step's ``vis`` maps."""
        try:
            if is_primary():  # multi-host: every process computes, one writes
                render_vis_panels(self.vis, x0, target, vis, fp)
        except Exception as e:  # visualisation must never kill a round
            print(f"visualisation failed: {e}")


def _pad_to_stride(batch, stride: int):
    """Reflect-pad x to a stride multiple (VOC eval, model.py:185-191)."""
    x = batch["x"]
    h, w = x.shape[1:3]
    ph = (stride - h % stride) % stride
    pw = (stride - w % stride) % stride
    if ph or pw:
        x = np.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
    return {**batch, "x": x}, (h, w)
