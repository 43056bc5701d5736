"""Test harness: force an 8-virtual-device CPU backend before jax initializes.

This is the JAX-native "fake communication backend" the reference lacks
(SURVEY.md §4): every multi-device code path (data-parallel pjit, all_gather
contrastive loss, sharded eval) runs under pytest on one machine.

Note: the environment pre-sets JAX_PLATFORMS=axon (the real-TPU tunnel), and
the axon plugin wins over the env var — `jax.config.update` is the reliable
override, combined with XLA_FLAGS set before jax import for the 8 virtual
CPU devices.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's wall time is dominated by
# re-compiling the same tiny jitted models every run; cache survives across
# pytest invocations (safe to delete /tmp/x2vlm_jax_cache any time).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("X2VLM_JAX_CACHE", "/tmp/x2vlm_jax_cache"))
# cache even sub-second compiles: the suite builds hundreds of small programs
# (collates, eval metrics, per-task train steps) whose compiles individually
# sit under the 1s default threshold but sum to minutes per run
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
