"""Test environment: force the CPU platform with 8 virtual devices so
multi-chip sharding paths run anywhere (the TPU-world 'fake cluster',
SURVEY.md §4).

Note: in some environments jax is preloaded with a TPU platform already
selected via JAX_PLATFORMS; ``jax.config.update`` still switches the backend
as long as no computation has run, so we do both (env var for clean
processes, config.update for preloaded ones).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
