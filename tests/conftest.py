"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware the standard way: give
jax 8 virtual CPU devices so pjit meshes compile and execute. The container's
sitecustomize imports jax (axon TPU backend) before conftest runs, so env
vars are too late — use jax.config, which takes effect because no backend has
been initialized yet.
"""

import os

os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# The fast lane is compile-bound (shapes are tiny; each distinct jit of the
# full model costs seconds-to-a-minute on the 8-device CPU mesh). JAX's
# persistent compilation cache makes repeat runs pay execution only — a
# cold run populates /tmp and the next run of the unchanged program hits.
# Keyed by HLO+config hash, so stale entries are unreachable, never wrong.
jax.config.update("jax_compilation_cache_dir", "/tmp/pcp_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
