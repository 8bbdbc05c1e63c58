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

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
