"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the JAX-standard substitute for multi-chip hardware (SURVEY.md §4): real
pjit/psum/shard_map semantics over `--xla_force_host_platform_device_count=8` CPU
devices. Must set the env vars before jax initializes a backend.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin rewrites JAX_PLATFORMS to "axon,cpu" behind our back; the env
# var alone does NOT pin the tests to CPU. The config update below does.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: repeat test runs skip XLA recompiles (the fast
# tier drops from ~7 to ~2 minutes warm). Same cache dir as cli/bench.
from feed_forward_vqgan_clip_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
# tests compile many small graphs; cache them all (prod keeps the 5 s floor)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
