"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices (SURVEY.md section 4);
real-TPU execution is exercised by bench.py / the driver instead.

Note: this environment's sitecustomize imports jax at interpreter start and
pins jax_platforms to the tunneled 'axon' TPU backend via jax.config, which
both overrides JAX_PLATFORMS and would funnel every test op through the
tunnel. We force the config back to cpu here, before any test imports jax
APIs that create backends.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import _cpu_pin  # noqa: E402  (repo root — the shared pinning helper)

_cpu_pin.force_cpu(8)

import jax  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()

# Persistent compilation cache: repeated runs (and the smoke tier) skip
# recompiles of unchanged test jits. Keyed by backend+flags, so the CPU
# tests never collide with bench's TPU cache entries.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("TRACER_TEST_COMPILE_CACHE",
                                 "/tmp/tracer_jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
