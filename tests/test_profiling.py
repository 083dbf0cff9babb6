"""PhaseTimer / profiling utilities."""

import json
import time

from pixelpick_tpu.utils.profiling import PhaseTimer, trace


def test_phase_timer_accumulates_and_dumps(tmp_path):
    t = PhaseTimer()
    with t.phase("train", n_items=10):
        time.sleep(0.01)
    with t.phase("train", n_items=10):
        time.sleep(0.01)
    with t.phase("val", n_items=3):
        pass
    s = t.summary()
    assert s["train"]["items"] == 20
    assert s["train"]["seconds"] >= 0.02
    assert s["train"]["items_per_sec"] > 0
    assert s["val"]["items"] == 3

    p = tmp_path / "x" / "timing.json"
    t.dump(str(p))
    loaded = json.loads(p.read_text())
    assert set(loaded) == {"train", "val"}


def test_trace_noop_without_dir():
    with trace(None):
        pass
    with trace(""):
        pass
