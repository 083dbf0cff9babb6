"""Configuration / flag surface.

Recreates the public flag surface and per-dataset hyper-parameter blocks of
the reference (``/root/reference/args.py:10-205``), as first-class config:

- every reference flag is preserved with the same name, default and choices
  (``args.py:14-55``), plus ``--p_dataset_config`` / ``--p_state_dict`` /
  ``--eval_interval`` which the reference only adds in per-tool ``__main__``
  blocks (a known defect, ``args.py:79`` vs ``train.py:193-195``) — here they
  are always present;
- per-dataset hyper-parameter blocks (``args.py:88-152``): batch size,
  ignore index, mean/std, #classes, #epochs, optimizer and LR-schedule
  choices;
- the derived augmentation dict (``args.py:64-76``), ``stride_total``
  (``args.py:77``), YAML overlay (``args.py:79-85``) and the experiment-name
  builder (``args.py:154-180``);
- TPU-native extensions (all optional, default to reference-faithful
  behaviour): compute precision, cross-replica BatchNorm, pool-scoring batch
  size, data-parallel mesh size.
"""

from __future__ import annotations

import os
import random
from argparse import ArgumentParser, Namespace
from pprint import pformat

import numpy as np
import yaml


def build_parser() -> ArgumentParser:
    parser = ArgumentParser("PixelPick-TPU")

    # generic (reference args.py:14-21)
    parser.add_argument("--debug", "-d", action="store_true", default=False)
    parser.add_argument("--dir_root", type=str, default="..")
    parser.add_argument("--dir_checkpoints", type=str, default="")
    parser.add_argument("--gpu_ids", type=str, nargs="+", default="0",
                        help="kept for CLI compatibility; ignored on TPU")
    parser.add_argument("--n_workers", type=int, default=4)
    parser.add_argument("--network_name", type=str, default="deeplab",
                        choices=["deeplab", "FPN"])
    parser.add_argument("--seed", "-s", type=int, default=0)
    parser.add_argument("--suffix", type=str, default="")

    # active learning (args.py:24-28)
    parser.add_argument("--n_pixels_by_us", type=int, default=10,
                        help="# pixels selected by uncertainty sampling per round")
    parser.add_argument("--top_n_percent", type=float, default=0.05)
    parser.add_argument("--query_strategy", "-qs", type=str, default="margin_sampling",
                        choices=["least_confidence", "margin_sampling", "entropy", "random"])
    parser.add_argument("--reverse_order", action="store_true", default=False)

    # MC-dropout committee (args.py:31-34)
    parser.add_argument("--use_mc_dropout", action="store_true", default=False)
    parser.add_argument("--mc_dropout_p", type=float, default=0.2)
    parser.add_argument("--mc_n_steps", type=int, default=20)
    parser.add_argument("--vote_type", type=str, default="soft", choices=["soft", "hard"])
    parser.add_argument("--mc_dropout2d_committee", action="store_true",
                        default=False,
                        help="also activate the MobileNetV2 Dropout2d sites "
                             "during MC-committee scoring. The reference's "
                             "turn_on_dropout only re-enables nn.Dropout "
                             "modules (deeplab.py:33-36) and nn.Dropout2d is "
                             "NOT an nn.Dropout subclass, so those sites stay "
                             "inactive there — the default reproduces that")

    # budget (args.py:37-39)
    parser.add_argument("--n_init_pixels", type=int, default=0)
    parser.add_argument("--max_budget", type=int, default=100,
                        help="maximum budget in pixels per image")
    parser.add_argument("--nth_query", type=int, default=1)

    # dataset (args.py:42-47)
    parser.add_argument("--dataset_name", type=str, default="cv",
                        choices=["cs", "cv", "voc", "custom"])
    parser.add_argument("--dir_datasets", type=str, default="/datasets")
    parser.add_argument("--downsample", type=int, default=4,
                        help="downsample factor for the Cityscapes training set")
    parser.add_argument("--use_aug", type=lambda s: s not in ("0", "false", "False"),
                        default=True)
    parser.add_argument("--use_augmented_dataset", action="store_true", default=False)
    parser.add_argument("--dir_augmented_dataset", type=str, default="",
                        help="root of the augmented VOC train set "
                             "({root}/images, {root}/annot pairs); defaults to "
                             "{dir_dataset}/VOCdevkit/VOC2012/train_aug "
                             "(reference args.py:133)")

    # encoder (args.py:50-55)
    parser.add_argument("--n_layers", type=int, default=50, choices=[18, 34, 50, 101])
    parser.add_argument("--use_dilated_resnet", type=lambda s: s not in ("0", "false", "False"),
                        default=True)
    parser.add_argument("--weight_type", type=str, default="supervised",
                        choices=["random", "supervised", "moco_v2"])
    parser.add_argument("--width_multiplier", type=float, default=1.0)

    # flags the reference only defines in tool __main__s (train.py:187-195,
    # query.py:364-367, eval.py:104-109) — first-class here
    parser.add_argument("--p_dataset_config", "-pdc", type=str, default=None)
    parser.add_argument("--p_state_dict", type=str, default="")
    parser.add_argument("--eval_interval", type=int, default=1)
    parser.add_argument("--visualize_interval", type=int, default=100,
                        help="standalone eval CLI: write a 6-panel PNG "
                             "every N val images (reference eval.py:133 "
                             "hard-codes 100)")

    # ---- TPU-native extensions (no reference equivalent) ----
    parser.add_argument("--precision", type=str, default="f32",
                        choices=["f32", "bf16"],
                        help="compute dtype for conv/matmul inside the model")
    parser.add_argument("--bn_group_size", type=int, default=0,
                        help="ghost BatchNorm: compute BN moments over fixed "
                             "groups of this many samples instead of the whole "
                             "(global) batch. '--batch_size 48 --bn_group_size "
                             "4' reproduces the reference's single-device bs=4 "
                             "BN statistics at 12x the step size, on any mesh; "
                             "0 = whole-batch moments (XLA syncs across the "
                             "data mesh automatically)")
    parser.add_argument("--val_batch_size", type=int, default=1,
                        help="validation batch size (reference uses 1, "
                             "utils.py:75-109; uniform-shape datasets can "
                             "batch higher)")
    parser.add_argument("--pool_batch_size", type=int, default=32,
                        help="images per device step during pool scoring "
                             "(reference uses batch-size 1, query.py:159); "
                             "32 matches the benchmarked production config")
    parser.add_argument("--micro_batch_size", type=int, default=0,
                        help="execute each train batch as SEQUENTIAL "
                             "optimizer updates of this size inside one "
                             "jitted dispatch (lax.scan megabatch, "
                             "engine/trainer.py:make_microbatch_train_step)."
                             " --batch_size 48 --micro_batch_size 4 runs the"
                             " reference's exact bs-4 schedule (12 Adam "
                             "updates + bs-4 BN moments per dispatch) while "
                             "amortizing per-step dispatch overhead. 0 = "
                             "one update per batch (default)")
    parser.add_argument("--prng", type=str, default="auto",
                        choices=["auto", "threefry", "rbg"],
                        help="jax PRNG implementation for in-model "
                             "randomness; 'auto' = hardware rbg on TPU "
                             "(threefry dropout costs ~19 ms/step at bs48), "
                             "threefry elsewhere")
    parser.add_argument("--data_parallel", type=int, default=0,
                        help="number of devices on the ('data',) mesh axis; "
                             "0 = all available devices")
    parser.add_argument("--dist_coordinator", type=str, default="",
                        help="multi-host mode: coordinator host:port for "
                             "jax.distributed.initialize, or 'auto' to use "
                             "JAX's TPU-pod/cluster auto-detection. Empty = "
                             "single-process (parallel/distributed.py)")
    parser.add_argument("--dist_num_processes", type=int, default=1,
                        help="total number of JAX processes (one per host); "
                             "used with an explicit --dist_coordinator")
    parser.add_argument("--dist_process_id", type=int, default=0,
                        help="this process's rank in [0, dist_num_processes)")
    parser.add_argument("--spatial_query_sharding", action="store_true",
                        default=False,
                        help="shard pool-sweep images over the mesh by "
                             "HEIGHT stripes instead of by batch (model "
                             "parallelism for large-image/small-pool "
                             "regimes; GSPMD inserts the conv halo "
                             "exchanges — parallel/mesh.py:"
                             "shard_batch_spatial)")
    parser.add_argument("--pretrained_ckpt", type=str, default="",
                        help="path to a converted pretrained backbone "
                             "checkpoint (see models/convert.py)")
    parser.add_argument("--device_augment", action="store_true", default=False,
                        help="stage the dataset in HBM and run the full "
                             "augmentation pipeline on device (uniform-shape "
                             "datasets; see data/device_pipeline.py)")
    parser.add_argument("--pallas_dw", action="store_true", default=False,
                        help="use the Pallas depthwise-conv kernel "
                             "(ops/depthwise.py) instead of XLA's grouped conv")
    parser.add_argument("--s2d_backbone",
                        type=lambda s: s not in ("0", "false", "False"),
                        default=False,
                        help="evaluate the first 4 MobileNetV2 blocks in "
                             "space-to-depth layout (exact rewrite, "
                             "models/s2d_block.py). Experimental and "
                             "measured SLOWER than the XLA default inside "
                             "the full train step (148 vs 108 ms bs48 "
                             "bf16, scripts/perf_probe.py) — kept as a "
                             "tested record of the experiment")
    parser.add_argument("--fused_ir", action="store_true", default=False,
                        help="run eligible stride-1 t=6 MobileNetV2 blocks "
                             "through the fused inverted-residual Pallas "
                             "kernel (ops/fused_ir.py): one ghost-BN group "
                             "resident in VMEM, thin block in/out as the "
                             "only HBM traffic, backward recomputed "
                             "in-kernel. Single-process/single-host path; "
                             "see PERF.md for measurements")
    parser.add_argument("--conv3x3_matmul", action="store_true", default=False,
                        help="lower same-shape stride-1 3x3 convs (decoder "
                             "head, ASPP atrous branches) to 9 tap channel "
                             "matmuls instead of lax.conv "
                             "(models/layers.py:Conv3x3MatMul). Measured "
                             "SLOWER than XLA's convs (train 163 vs 108 ms "
                             "bs48 bf16; scoring 569 vs 886 imgs/s) — "
                             "experimental, default off")
    parser.add_argument("--ckpt_backend", type=str, default="msgpack",
                        choices=["msgpack", "orbax"],
                        help="best-model checkpoint format: flax msgpack "
                             "file (default, reference-style synchronous "
                             "save) or orbax async directory (background "
                             "IO for long runs)")
    parser.add_argument("--stage_ckpt_interval", type=int, default=0,
                        help="save a resumable mid-stage snapshot (full "
                             "TrainState: params, BN stats, optimizer "
                             "moments, LR step; plus epoch and best mIoU) "
                             "every N epochs to {stage}/stage_state.ckpt; "
                             "on restart the stage resumes from it. 0 = "
                             "off (reference semantics: a crashed stage "
                             "restarts from scratch, model.py:163)")
    parser.add_argument("--resume_campaign", action="store_true",
                        default=False,
                        help="fast-forward AL rounds whose next-round "
                             "queries.pkl already exists on disk (the "
                             "round completed): merge the recorded picks "
                             "instead of retraining. With "
                             "--stage_ckpt_interval this makes a crashed "
                             "campaign fully resumable")
    parser.add_argument("--profile_dir", type=str, default="",
                        help="write jax.profiler traces of the train and "
                             "query phases to this directory (TensorBoard-"
                             "loadable; see utils/profiling.trace)")
    return parser


# per-dataset hyper-parameter blocks, mirroring reference args.py:88-152
DATASET_DEFAULTS = {
    "cs": dict(
        batch_size=4,
        ignore_index=19,
        mean=[0.28689554, 0.32513303, 0.28389177],
        std=[0.18696375, 0.19017339, 0.18720214],
        n_classes=19,
        n_epochs=50,
        optimizer_type="Adam",
        lr_scheduler_type="Poly",
        optimizer_params={"lr": 5e-4, "betas": (0.9, 0.999),
                          "weight_decay": 2e-4, "eps": 1e-7},
        dir_dataset_name="cityscapes",
    ),
    "cv": dict(
        batch_size=4,
        downsample=1,
        ignore_index=11,
        mean=[0.41189489566336, 0.4251328133025, 0.4326707089857],
        std=[0.27413549931506, 0.28506257482912, 0.28284674400252],
        n_classes=11,
        n_epochs=50,
        optimizer_type="Adam",
        lr_scheduler_type="MultiStepLR",
        optimizer_params={"lr": 5e-4, "betas": (0.9, 0.999),
                          "weight_decay": 2e-4, "eps": 1e-7},
        dir_dataset_name="camvid",
    ),
    "voc": dict(
        batch_size=10,
        ignore_index=255,
        mean=[0.485, 0.456, 0.406],
        std=[0.229, 0.224, 0.225],
        n_classes=21,
        n_epochs=50,
        size_base=400,
        size_crop=320,
        optimizer_type="SGD",
        lr_scheduler_type="Poly",
        optimizer_params={"lr": 1e-2, "weight_decay": 1e-4, "momentum": 0.9},
        dir_dataset_name="VOC2012",
    ),
}


def enable_compile_cache() -> None:
    """Persistent XLA compilation cache. TPU compiles through a tunnel can
    take minutes; caching makes repeated CLI/bench invocations fast."""
    import jax

    cache_dir = os.environ.get("PIXELPICK_JAX_CACHE",
                               os.path.expanduser("~/.pixelpick_jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def configure_tpu_rng(prng: str = "auto") -> None:
    """Select the jax PRNG implementation for in-model randomness.

    ``auto``: hardware ``rbg`` on TPU, threefry elsewhere. threefry
    generates random bits in VPU ALU ops; the decoder's Dropout(0.5) alone
    draws ~132M bits per bs-48 step, measured at ~19 ms/step (126 -> 107 ms,
    +18% train throughput) on v5e. rbg is a counter-based hardware generator
    with the same jax.random API. CPU (tests) keeps threefry so test
    behaviour is backend-stable. Overridable via ``--prng`` (this mutates
    the process-global default PRNG impl — a deliberate CLI-level side
    effect).
    """
    import jax

    try:
        if prng == "auto":
            prng = "rbg" if jax.default_backend() == "tpu" else "threefry"
        if prng == "rbg":
            jax.config.update("jax_default_prng_impl", "rbg")
        elif prng == "threefry":
            jax.config.update("jax_default_prng_impl", "threefry2x32")
    except Exception:
        pass


def finalize_args(args: Namespace, write_files: bool = True) -> Namespace:
    """Apply derived fields, dataset blocks, YAML overlay, naming and seeding.

    Mirrors reference ``args.py:59-205`` (parse_args body).
    """
    enable_compile_cache()
    from pixelpick_tpu.parallel.distributed import initialize_from_args
    initialize_from_args(args)  # no-op unless --dist_coordinator is set
    configure_tpu_rng(getattr(args, "prng", "auto"))
    if getattr(args, "pallas_dw", False):
        from pixelpick_tpu.models.layers import set_depthwise_impl
        set_depthwise_impl("pallas")
    if getattr(args, "conv3x3_matmul", False):
        from pixelpick_tpu.models.layers import set_conv3x3_impl
        set_conv3x3_impl("matmul")
    args.augmentations = {
        "geometric": {
            "random_scale": args.use_aug,
            "random_hflip": args.use_aug,
            "crop": args.use_aug,
        },
        "photometric": {
            "random_color_jitter": args.use_aug,
            "random_grayscale": args.use_aug,
            "random_gaussian_blur": args.use_aug,
        },
    }
    args.stride_total = 8 if args.use_dilated_resnet else 32

    if getattr(args, "p_dataset_config", None):
        if not os.path.exists(args.p_dataset_config):
            raise FileNotFoundError(args.p_dataset_config)
        with open(args.p_dataset_config) as f:
            overlay = yaml.safe_load(f)
        d = vars(args)
        d.update(overlay)
        args = Namespace(**d)
    else:
        block = DATASET_DEFAULTS.get(args.dataset_name)
        if block is None:
            raise ValueError(f"Unsupported dataset name: {args.dataset_name}; "
                             f"pass --p_dataset_config for a custom dataset")
        for k, v in block.items():
            if k == "dir_dataset_name":
                if not getattr(args, "dir_dataset", None):
                    args.dir_dataset = os.path.join(args.dir_datasets, v)
            else:
                setattr(args, k, v)
    if not getattr(args, "dir_augmented_dataset", ""):
        # reference args.py:133 hardcodes this path under the VOC root
        args.dir_augmented_dataset = os.path.join(
            getattr(args, "dir_dataset", args.dir_datasets),
            "VOCdevkit", "VOC2012", "train_aug")

    # experiment-name builder (args.py:154-180)
    kw = [args.dataset_name]
    if args.dataset_name == "cs":
        kw.append(f"d{args.downsample}")
    kw.append(args.network_name)
    if args.network_name == "FPN":
        kw += [str(args.n_layers), str(args.weight_type)]
    if args.n_pixels_by_us > 0:
        kw.append(args.query_strategy)
        if args.use_mc_dropout:
            kw.append(args.vote_type)
        kw.append(str(args.n_pixels_by_us))
        if args.top_n_percent > 0.0:
            kw.append(f"p{args.top_n_percent}")
        if args.reverse_order:
            kw.append("reverse")
    else:
        kw.append("fully_sup")
    kw.append(str(args.seed))
    if args.suffix:
        kw.append(args.suffix)
    if args.debug:
        kw.append("debug")
    args.experim_name = "_".join(kw)

    if not args.dir_checkpoints:
        args.dir_checkpoints = f"{args.dir_root}/checkpoints/{args.experim_name}"
    if write_files:
        os.makedirs(args.dir_checkpoints, exist_ok=True)
        with open(f"{args.dir_checkpoints}/args.txt", "w") as f:
            f.write(pformat(vars(args)))

    # host-side seeding; device RNG is handled by explicit jax PRNG keys
    random.seed(args.seed)
    np.random.seed(args.seed)
    return args


class Arguments:
    """Drop-in replacement for the reference ``Arguments`` class (args.py:10)."""

    def __init__(self):
        self.parser = build_parser()

    def parse_args(self, argv=None, verbose: bool = False) -> Namespace:
        args = self.parser.parse_args(argv)
        args = finalize_args(args)
        if verbose:
            for k, v in sorted(vars(args).items()):
                print(k, v)
        print(f"\nmodel name: {args.experim_name}\n")
        return args


def default_args(dataset_name: str = "cv", write_files: bool = False,
                 **overrides) -> Namespace:
    """Programmatic config: defaults for ``dataset_name`` plus overrides."""
    parser = build_parser()
    args = parser.parse_args([])
    args.dataset_name = dataset_name
    for k, v in overrides.items():
        setattr(args, k, v)
    args = finalize_args(args, write_files=write_files)
    for k, v in overrides.items():  # overrides win over dataset blocks too
        if k in vars(args):
            setattr(args, k, v)
    return args
