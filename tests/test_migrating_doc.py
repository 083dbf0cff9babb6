"""MIGRATING.md stays truthful: every `--flag` it names exists in the
parser, every entry point / script / module it maps to exists, and the
convert CLI accepts the fetch names it advertises."""

import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
DOC = (ROOT / "MIGRATING.md").read_text()


def test_all_named_flags_exist():
    from pixelpick_tpu.config import build_parser

    parser = build_parser()
    known = set()
    for action in parser._actions:
        known.update(action.option_strings)
    # also catch alias-prefixed mentions like `-qs/--query_strategy`
    named = set(re.findall(r"`(?:-[a-z]+/)?(--[a-z0-9_-]+)", DOC))
    # flags documented for other CLIs, not main_al's parser
    named -= {"--p_queries", "--via_annot_file", "--converted_file",
              "--labels-from-gt", "--fetch", "--dir_imgs", "--path_query",
              "--serve_dir", "--no_browser", "--headless", "--out",
              "--dir_gts"}
    # choices written as `--flag {a,b}` in the doc
    named = {f.split(" ")[0] for f in named}
    missing = sorted(f for f in named if f not in known)
    assert not missing, f"MIGRATING.md names unknown flags: {missing}"


def test_entry_points_and_scripts_exist():
    for rel in ["main_al.py", "train.py", "eval.py", "query.py",
                "scripts/pixelpick-dl-cv.sh", "scripts/train-a-round.sh",
                "scripts/query.sh", "PARITY.md", "PERF.md",
                "pixelpick_tpu/human/annotation.py",
                "pixelpick_tpu/human/via.py",
                "pixelpick_tpu/models/convert.py"]:
        assert (ROOT / rel).exists(), rel


def test_convert_fetch_names():
    from pixelpick_tpu.models.convert import FETCH_URLS

    for name in re.findall(r"--fetch ([a-z0-9_]+)", DOC):
        assert name in FETCH_URLS, name


def test_query_strategies_documented_match_code():
    import numpy as np
    import jax
    from pixelpick_tpu.active.acquisition import uncertainty_map

    prob = np.full((1, 2, 2, 3), 1 / 3, np.float32)
    for s in ("least_confidence", "margin_sampling", "entropy", "random"):
        assert s in DOC
        out = uncertainty_map(prob, s, rng=jax.random.PRNGKey(0))
        assert out.shape == (1, 2, 2)
