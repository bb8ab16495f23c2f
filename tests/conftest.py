"""Test env: run JAX on a virtual 8-device CPU mesh (TPU-free CI analogue).

Must set flags before jax initializes — keep this file import-light.
"""

import os

# Force CPU: the session env pins JAX_PLATFORMS to the TPU plugin, and the
# site customization pre-imports jax at interpreter start — so the env var
# alone is too late; update the live config too (before any backend init).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
