"""Campaign-level parity against the ACTUAL reference implementation.

The strongest accuracy evidence this environment allows (real CamVid and
pretrained weights are absent from the image — PARITY.md "Known gaps"):
execute the reference's OWN full AL loop (``model.py:Model``, imported
unmodified in a subprocess — ``tests/reference_campaign_worker.py``) and
this framework's ``ALModel`` on the SAME synthetic colour-coded dataset,
same seed / schedule / strategy / budget, and compare:

1. the seeded initial queries — must decode IDENTICAL pixel-for-pixel
   (camvid.py:50-96 recipe + query.py:71-142 codec parity),
2. every per-round query artifact the reference writes — our codec must
   decode it with the exact pick budget and disjointness invariants,
3. the val-mIoU learning trajectories — both sides must genuinely learn
   and land in the same band at every stage.

This is an end-to-end cross-implementation test: it exercises the
reference's torch training + acquisition against our jitted sparse-CE
training + batched acquisition with no shared code between the sides.
Weight init and batch shuffling necessarily differ (different frameworks'
RNGs), so trajectories are compared in a band, not bit-exact — per-step
exactness from shared weights is covered by
test_model_parity.py:test_train_round_tracks_torch_oracle.
"""

import os
import pickle as pkl
import subprocess
import sys

import numpy as np
import pytest

from tests.helpers import make_learnable_camvid, synthetic_args

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "reference_campaign_worker.py")

N_PIXELS = 10
MAX_BUDGET = 30  # 3 AL stages
N_EPOCHS = 15
LR = "2e-3"  # test_al_learning.py's proven-learnable small-data LR


def _run_reference(data_dir, ref_root, n_epochs, extra=()):
    out = subprocess.run(
        [sys.executable, WORKER, data_dir, ref_root, str(n_epochs),
         str(MAX_BUDGET), str(N_PIXELS), "0", LR, *extra],
        capture_output=True, text=True, timeout=3000, cwd=REPO)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-4000:])
    exp = [l.split("=", 1)[1] for l in out.stdout.splitlines()
           if l.startswith("EXPERIM_DIR=")]
    assert exp, out.stdout[-2000:]
    return exp[0], out.stdout


def _our_args(tmp_path):
    return synthetic_args(
        tmp_path, maker=make_learnable_camvid,
        query_strategy="margin_sampling", n_pixels_by_us=N_PIXELS,
        max_budget=MAX_BUDGET, n_epochs=N_EPOCHS, use_aug=False,
        val_batch_size=4,
        optimizer_params={"lr": float(LR), "betas": (0.9, 0.999),
                          "weight_decay": 2e-4, "eps": 1e-7},
    )


def _decoded(path):
    from pixelpick_tpu.active import codec

    with open(path, "rb") as f:
        return codec.decode_queries(pkl.load(f))


def _val_curve(exp_dir):
    """Best val mIoU per AL stage from the side's own log_val.txt CSVs."""
    curve, stage = [], 0
    while os.path.isfile(f"{exp_dir}/{stage}_query/log_val.txt"):
        with open(f"{exp_dir}/{stage}_query/log_val.txt") as f:
            lines = f.read().strip().splitlines()
        assert lines[0] == "epoch,mIoU,pixel_acc"
        curve.append(max(float(l.split(",")[1]) for l in lines[1:]))
        stage += 1
    return curve


def test_initial_queries_match_reference(tmp_path):
    """Dataset construction alone (no training): the reference's seeded
    initial random queries and ours must be pixel-identical — same
    np.random stream recipe (camvid.py:67-84), same void filtering, and a
    byte-compatible pkl codec in both directions."""
    args = _our_args(tmp_path)
    ref_dir, out = _run_reference(args.dir_dataset, str(tmp_path / "ref"),
                                  1, extra=("--init-only",))
    from pixelpick_tpu.data.camvid import CamVidDataset

    CamVidDataset(args)  # generates + caches our 0_query/queries.pkl
    ours = _decoded(f"{args.dir_checkpoints}/0_query/queries.pkl")
    refs = _decoded(f"{ref_dir}/0_query/queries.pkl")
    assert len(ours) == len(refs) == 8
    for a, b in zip(ours, refs):
        np.testing.assert_array_equal(a, b)
    n_total = [int(l.split("=", 1)[1]) for l in out.splitlines()
               if l.startswith("N_PIXELS_TOTAL=")][0]
    assert n_total == 8 * N_PIXELS


def test_reference_decodes_our_artifacts(tmp_path):
    """The reverse interop direction: a queries.pkl WE encode must decode
    with the reference's own ``QuerySelector.decode_queries`` to the exact
    same masks (worker ``--decode`` mode runs the reference codec)."""
    import hashlib

    from pixelpick_tpu.active.codec import encode_query, decode_queries

    rng = np.random.default_rng(5)
    enc = {}
    for i in range(4):
        q = rng.random((48, 64)) < 0.01
        enc.update(encode_query(f"{i:03d}.png", (48, 64), q))
    p = str(tmp_path / "queries.pkl")
    with open(p, "wb") as f:
        pkl.dump(enc, f)

    out = subprocess.run(
        [sys.executable, WORKER, "--decode", p],
        capture_output=True, text=True, timeout=600, cwd=REPO)
    assert out.returncode == 0, out.stderr[-4000:]
    got = dict(l.split("=", 1) for l in out.stdout.splitlines() if "=" in l)

    ours = decode_queries(enc)
    digest = hashlib.sha256()
    for m in ours:
        digest.update(np.ascontiguousarray(m).tobytes())
    assert got["N_MASKS"] == "4"
    assert got["SUMS"] == ",".join(str(int(m.sum())) for m in ours)
    assert got["DTYPE"] == "bool"
    assert got["SHA"] == digest.hexdigest()


def test_cityscapes_remap_matches_reference(tmp_path):
    """Our vectorised 256-entry Cityscapes label LUT
    (data/cityscapes.py:classes_to_labels_lut) must compute the identical
    33->19 mapping as the reference's per-pixel interpreted loop
    (cityscapes.py:137-180), over every valid labelId."""
    from pixelpick_tpu.data.cityscapes import classes_to_labels_lut

    rng = np.random.default_rng(9)
    arr = rng.integers(0, 34, (64, 96)).astype(np.uint8)
    arr[0, :34] = np.arange(34)  # every id at least once
    src, dst = str(tmp_path / "in.npy"), str(tmp_path / "out.npy")
    np.save(src, arr)
    out = subprocess.run(
        [sys.executable, WORKER, "--cs-remap", src, dst],
        capture_output=True, text=True, timeout=600, cwd=REPO)
    assert out.returncode == 0, out.stderr[-4000:]
    np.testing.assert_array_equal(classes_to_labels_lut()[arr].astype(int),
                                  np.load(dst).astype(int))


@pytest.fixture(scope="module")
def campaigns(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refcamp")
    args = _our_args(tmp)

    ref_dir, _ = _run_reference(args.dir_dataset, str(tmp / "ref"), N_EPOCHS)

    from pixelpick_tpu.active.driver import ALModel

    model = ALModel(args)
    model.dataset.crop_size = (48, 64)
    model()
    model.close()
    return args.dir_checkpoints, ref_dir


# the interop tests above stay in the fast suite; only the two full
# campaigns below are slow-marked

@pytest.mark.slow  # a full torch CPU campaign + a full jax campaign
def test_reference_artifacts_cross_decode(campaigns):
    """Every queries.pkl the reference campaign wrote must decode with our
    codec to exactly N_PIXELS picks per image with the reference's ACTUAL
    on-disk structure — which this test documents by measurement:

    each round n, the reference dumps its picks TWICE — once at
    ``{n}_query`` against the query-pool dataset (query.py:220, OVERWRITING
    the initial-query cache at 0_query on round 0) and once at
    ``{n+1}_query`` against the train dataset (model.py:84). After a full
    campaign, ``{n}_query`` holds round-n's picks for n < n_stages and the
    final round's picks are duplicated at ``{n_stages}_query``; the seeded
    INITIAL queries survive nowhere on disk (an rglob merge resume,
    query.py:311-351, silently loses them). Our driver deliberately
    deviates: 0_query keeps the initial cache and round-n picks land at
    ``{n+1}_query`` only (see PARITY.md 'Documented protocol deviations');
    test_e2e_synthetic pins our layout."""
    ours_dir, ref_dir = campaigns
    n_stages = MAX_BUDGET // N_PIXELS

    stages = [_decoded(f"{ref_dir}/{s}_query/queries.pkl")
              for s in range(n_stages + 1)]
    for stage, masks in enumerate(stages):
        assert len(masks) == 8
        assert all(int(m.sum()) == N_PIXELS for m in masks), stage
    # rounds 0..n_stages-1: pairwise-disjoint fresh picks
    for a in range(n_stages):
        for b in range(a + 1, n_stages):
            for x, y in zip(stages[a], stages[b]):
                assert not np.logical_and(x, y).any(), (a, b)
    # the final round's picks are dumped twice
    for x, y in zip(stages[n_stages - 1], stages[n_stages]):
        np.testing.assert_array_equal(x, y)

    # the reference's 0_query no longer holds the initial queries (they
    # were overwritten by round-0 picks); ours still does — and every
    # reference round is disjoint from those initial picks, because the
    # query-pool dataset's in-memory exclusion state still contains them
    init = _decoded(f"{ours_dir}/0_query/queries.pkl")
    assert any(not np.array_equal(i, r) for i, r in zip(init, stages[0]))
    for s in range(n_stages):
        for i, m in zip(init, stages[s]):
            assert not np.logical_and(i, m).any(), s


@pytest.mark.slow
def test_val_curves_land_in_same_band(campaigns):
    """Both implementations, fed identical data/seed/schedule, must learn —
    and land in the same val-mIoU band at the final stage. Weight init and
    shuffling RNGs differ between frameworks, so this is a band comparison;
    the band is calibrated against measured runs (see PARITY.md)."""
    ours_dir, ref_dir = campaigns
    ours, refs = _val_curve(ours_dir), _val_curve(ref_dir)
    n_stages = MAX_BUDGET // N_PIXELS
    assert len(ours) == len(refs) == n_stages

    # label-blind level is ~0.02-0.03 mIoU on 11 classes: both must learn
    assert ours[-1] > 0.12, f"our campaign failed to learn: {ours}"
    assert refs[-1] > 0.12, f"reference campaign failed to learn: {refs}"
    # same band at the final stage, and never grossly apart mid-curve
    assert abs(ours[-1] - refs[-1]) < 0.10, (ours, refs)
    assert all(abs(o - r) < 0.12 for o, r in zip(ours, refs)), (ours, refs)
    # the rebuild must never be meaningfully WORSE than the original
    # (measured: ours 0.185-0.196 vs reference 0.210 at these knobs)
    assert ours[-1] > refs[-1] - 0.07, (ours, refs)
