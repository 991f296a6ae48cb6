"""Test harness configuration.

Tests run on a CPU-emulated 8-device mesh (SURVEY.md §4 item 4): multi-chip
sharding paths are validated without TPU hardware via
``--xla_force_host_platform_device_count``. These env vars must be set before
jax is imported anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image pins JAX_PLATFORMS=axon in the parent environment and the plugin
# wins over the env var — the config update is the reliable override.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: tiny-model pipeline graphs recompile
# identically across test modules (and across suite re-runs) — caching them
# on disk cuts suite wall time substantially (VERDICT r1 #9).
jax.config.update(
    # per-uid path: a world-shared fixed dir breaks for the second user on a
    # multi-user machine (round-2 advisor; matches utils/jit_cache.py)
    "jax_compilation_cache_dir",
    f"/tmp/msa_tpu_jit_cache_{os.getuid()}",
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_models():
    """ONE tiny PipelineModels shared across all test modules — params are
    read-only, and sharing avoids re-initializing (and re-jitting against)
    fresh model objects per module (VERDICT r1 #9)."""
    from msa_tpu.pipeline.graph import PipelineModels

    return PipelineModels.tiny(seed=0)


def np_layer_norm(x: np.ndarray, eps: float = 1e-5) -> np.ndarray:
    """Independent numpy golden of torch LayerNorm (no affine): biased
    variance, eps inside sqrt."""
    x = x.astype(np.float64)
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps)
