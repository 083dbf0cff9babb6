"""Run the ACTUAL reference implementation's full AL campaign on CPU.

Executed as a subprocess by tests/test_reference_campaign.py (it must not
share a process with the repo's tests: the reference's top-level modules —
``model``, ``query``, ``utils``, ``args`` — collide with repo-root files, so
``/root/reference`` must be FIRST on sys.path before anything else imports).

The reference is imported as-is and used as a black-box oracle — no code is
copied, only compatibility shims applied:

- numpy 2.x removed the deprecated aliases the reference uses
  (``np.bool`` at query.py:41,66,99 / camvid.py:79, ``np.NaN`` at
  query.py:279)
- zero-egress environment: the MobileNetV2 ImageNet fetch
  (mobilenet_v2.py:139-147) is stubbed to random init, matching the
  framework-side campaign which also trains from scratch
- ``args.p_dataset_config`` is only added by the train.py/query.py mains
  (train.py:193-195) but read unconditionally at args.py:79 — main_al.py
  would crash without it (SURVEY.md §3.6); added here the same way
- ``QuerySelector`` hardcodes a cuda:0 default device (query.py:13) while
  ``Model`` itself falls back to CPU (model.py:21); pointed at the Model's
  device

argv: dir_dataset dir_root n_epochs max_budget n_pixels seed lr
"""

import os
import sys


def main() -> None:
    sys.path.insert(0, "/root/reference")
    os.environ.setdefault("MPLBACKEND", "Agg")

    # the reference's ``datasets/`` has no __init__.py (a namespace
    # package); the installed huggingface ``datasets`` is a REGULAR package
    # and regular packages win over namespace dirs regardless of sys.path
    # order — pin the name to the reference's directory explicitly
    import types
    datasets_pkg = types.ModuleType("datasets")
    datasets_pkg.__path__ = ["/root/reference/datasets"]
    sys.modules["datasets"] = datasets_pkg

    # torchvision is not installed (torch is CPU-only here). The campaign
    # runs with --use_aug off, so of the reference's torchvision surface
    # only TF.to_tensor / TF.normalize execute (base_dataset.py:184) —
    # both have simple, fixed semantics, stubbed faithfully below. The
    # augmentation classes are import-time names that never get
    # constructed with aug off; they raise loudly if that changes.
    import numpy as _np
    import torch as _torch

    def _to_tensor(pic):
        arr = _np.asarray(pic, _np.float32) / 255.0  # PIL RGB, HWC
        return _torch.from_numpy(arr.transpose(2, 0, 1).copy())

    def _normalize(t, mean, std, inplace=False):
        m = _torch.tensor(mean, dtype=t.dtype).view(-1, 1, 1)
        s = _torch.tensor(std, dtype=t.dtype).view(-1, 1, 1)
        return (t - m) / s

    class _AugDisabled:
        def __init__(self, *a, **k):
            raise RuntimeError("augmentation is disabled in this campaign")

    class _InterpolationMode:
        BILINEAR, NEAREST = "bilinear", "nearest"

    tv = types.ModuleType("torchvision")
    tv_transforms = types.ModuleType("torchvision.transforms")
    tv_functional = types.ModuleType("torchvision.transforms.functional")
    tv_functional.to_tensor = _to_tensor
    tv_functional.normalize = _normalize
    tv_transforms.ColorJitter = _AugDisabled
    tv_transforms.RandomApply = _AugDisabled
    tv_transforms.RandomGrayscale = _AugDisabled
    tv_transforms.InterpolationMode = _InterpolationMode
    tv_transforms.functional = tv_functional
    tv.transforms = tv_transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tv_transforms
    sys.modules["torchvision.transforms.functional"] = tv_functional

    import numpy as np
    # numpy 2.x compat for the reference's removed aliases: ``np.NaN``
    # (query.py:279) is gone; ``np.bool`` exists again in 2.0 (and
    # REASSIGNING it corrupts numpy's bool dtype naming to 'bool8' — do
    # not touch it)
    np.NaN = np.nan
    assert isinstance(np.zeros(1, dtype=np.bool).dtype, np.dtype)

    import torch.utils.model_zoo as model_zoo
    model_zoo.load_url = lambda *a, **k: {}

    if "--decode" in sys.argv:
        # decode a queries.pkl with the REFERENCE's own codec
        # (query.py:89-142) and print a digest — proves artifacts WE write
        # are readable by the reference's tooling, the reverse direction of
        # the campaign tests (which decode reference artifacts with ours)
        import hashlib
        import pickle as pkl

        path = sys.argv[sys.argv.index("--decode") + 1]
        from query import QuerySelector
        with open(path, "rb") as f:
            masks = QuerySelector.decode_queries(pkl.load(f))
        digest = hashlib.sha256()
        for m in masks:
            digest.update(np.ascontiguousarray(m).tobytes())
        print(f"N_MASKS={len(masks)}")
        print(f"SUMS={','.join(str(int(m.sum())) for m in masks)}")
        print(f"DTYPE={masks[0].dtype}")
        print(f"SHA={digest.hexdigest()}")
        return

    if "--cs-remap" in sys.argv:
        # apply the reference's 33->19 Cityscapes label remap — the O(H*W)
        # interpreted loop at cityscapes.py:137-180 — so the test can prove
        # our 256-entry LUT (data/cityscapes.py:classes_to_labels_lut)
        # computes the identical mapping
        i = sys.argv.index("--cs-remap")
        src, dst = sys.argv[i + 1], sys.argv[i + 2]
        from datasets.cityscapes import _cityscapes_classes_to_labels
        np.save(dst, _cityscapes_classes_to_labels(np.load(src)))
        print("REMAP_OK=1")
        return

    init_only = "--init-only" in sys.argv
    if init_only:
        sys.argv.remove("--init-only")
    dir_dataset, dir_root, n_epochs, max_budget, n_pixels, seed, lr = \
        sys.argv[1:8]

    from args import Arguments
    arguments = Arguments()
    arguments.parser.add_argument("--p_dataset_config", type=str, default=None)
    sys.argv = [
        "main_al.py",
        "--dataset_name", "cv",
        "--seed", seed,
        "--n_pixels_by_us", n_pixels,
        "--max_budget", max_budget,
        "--query_strategy", "margin_sampling",
        "--dir_root", dir_root,
        "--use_aug", "",  # type=bool flag: empty string -> False
        "--n_workers", "0",
    ]
    args = arguments.parse_args()
    # the cv block hardcodes these (args.py:109-129); point them at the
    # synthetic dataset and the test's short schedule AFTER parsing
    args.dir_dataset = dir_dataset
    args.n_epochs = int(n_epochs)
    args.optimizer_params = dict(args.optimizer_params, lr=float(lr))

    if init_only:
        # dataset construction alone: generates + caches the seeded initial
        # queries (camvid.py:50-96) without training anything
        from datasets.camvid import CamVidDataset
        ds = CamVidDataset(args)
        print(f"N_PIXELS_TOTAL={ds.n_pixels_total}")
    else:
        from model import Model
        m = Model(args)
        m.query_selector.device = m.device
        m()
    # hand the experiment directory back to the test
    print(f"EXPERIM_DIR={dir_root}/checkpoints/{args.experim_name}")


if __name__ == "__main__":
    main()
