"""Test env: force a virtual 8-device CPU mesh before JAX initializes.

Mirrors the reference's test approach of simulating multi-threadgroup GPU
execution serially on CPU (reference: CPUTests/*, e.g. RadixSortTest
main.cpp:9,140 loops over NUM_GRPS groups), but for real: the sharding
tests run the actual pjit/shard_map path over 8 virtual devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's sitecustomize may pin jax_platforms to a hardware
# plugin via jax.config at interpreter start; tests always run on the
# virtual 8-device CPU mesh, so re-pin (must happen before any backend
# initialization).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from raytracebvh_tpu.io.obj import load_obj
from raytracebvh_tpu.utils.assets import find_asset


@pytest.fixture(scope="session")
def rect_scene():
    path = find_asset("Rect.obj")
    if path is None:
        pytest.skip("Rect.obj asset not available")
    return load_obj(path)


@pytest.fixture(scope="session")
def test_scene():
    path = find_asset("Test.obj")
    if path is None:
        pytest.skip("Test.obj asset not available")
    return load_obj(path)
