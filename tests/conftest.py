"""Test harness config: force an 8-device virtual CPU platform.

Multi-chip sharding is validated without TPU hardware by running every test
on `--xla_force_host_platform_device_count=8` CPU devices (SURVEY.md §4:
the reference has no test suite at all; this is the strategy we build).
Must run before the first `import jax` anywhere in the test session.
"""

import os

# Force override: the session presets JAX_PLATFORMS=axon (a real TPU behind a
# network tunnel) via a sitecustomize hook that re-registers the backend after
# env parsing — so the env var alone is not enough; jax.config must be updated
# too. Unit tests always run on the virtual 8-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep compile times sane in CI.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the suite compiles hundreds of programs;
# repeat runs (CI, bisects) reuse them, which both cuts wall-clock and
# reduces in-process compile pressure (VERDICT r3 Weak-7: a single-process
# full run once died inside an XLA compile after ~35% of the suite)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
