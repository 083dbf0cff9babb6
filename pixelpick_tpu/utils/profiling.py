"""Tracing / profiling utilities.

The reference has no profiling at all (SURVEY.md §5 — only tqdm bars and
wall-clock in the GUI). TPU-native replacement:

- :class:`PhaseTimer` — wall-clock per phase (train / val / query) with
  imgs/sec, accumulated across an AL round and dumped as JSON;
- :func:`trace` — context manager around ``jax.profiler.trace`` producing a
  TensorBoard-loadable trace directory (set ``--profile_dir``);
- :func:`annotate` — ``jax.profiler.TraceAnnotation`` passthrough for
  labelling host-side phases inside a trace.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class PhaseTimer:
    def __init__(self):
        self._time: Dict[str, float] = defaultdict(float)
        self._items: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, n_items: int = 0) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._time[name] += time.perf_counter() - t0
            self._items[name] += n_items

    def add(self, name: str, seconds: float, n_items: int = 0) -> None:
        self._time[name] += seconds
        self._items[name] += n_items

    def summary(self) -> Dict[str, dict]:
        return {
            k: {
                "seconds": round(v, 4),
                "items": self._items[k],
                "items_per_sec": round(self._items[k] / v, 3) if v else None,
            }
            for k, v in self._time.items()
        }

    def dump(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace when ``log_dir`` is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)
