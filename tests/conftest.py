"""Test configuration: force an 8-device virtual CPU platform.

Multi-device tests (data-parallel mesh, shardings) run against 8 virtual CPU
devices — the CPU-mesh substitute for a real TPU slice (SURVEY.md §4).

Note: this machine's sitecustomize pre-imports jax with the `axon` TPU
platform, so env vars are too late; we use jax.config instead (which works
until the backend is first used).
"""

import os

os.environ.setdefault("TECOGAN_TESTING", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Keep float32 semantics exact on any platform.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(42)
