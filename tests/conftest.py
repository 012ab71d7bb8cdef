"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 devices (the framework's parallel/ layer only sees a
jax.sharding.Mesh, so the same code paths run on real TPU slices).

The platform override must go through jax.config: this image registers a
remote TPU backend at interpreter startup (sitecustomize) and pins
JAX_PLATFORMS in the environment, so the env-var route is not enough.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import tempfile

import numpy as np
import pytest

# keep test-generated ED caches out of the repo tree
os.environ.setdefault("ASP_TPU_CACHE_DIR", tempfile.mkdtemp(prefix="asp_tpu_cache_"))


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(12345)
