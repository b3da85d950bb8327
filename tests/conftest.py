"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere (SURVEY.md §4: multi-host
logic is tested single-host via xla_force_host_platform_device_count).

The real-TPU tier (tests/test_tpu_device.py — Pallas-vs-XLA parity on
chip, recompile-free steady state) runs with AR_TPU_TESTS=1, which keeps
the session on the default (TPU) backend instead of forcing CPU:

    AR_TPU_TESTS=1 pytest tests/test_tpu_device.py -q
"""
import os

TPU_TIER = os.environ.get("AR_TPU_TESTS") == "1"

if not TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

# The environment's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon (remote TPU tunnel), so the env var above is read too
# late — force the platform through the live config instead. Backends are
# created lazily, so this wins as long as it runs before any device use.
import jax  # noqa: E402

if not TPU_TIER:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
