"""Test configuration: force JAX onto CPU with 8 virtual devices.

This is the TPU-native analog of a fake backend (SURVEY.md §4): multi-chip
sharding tests run against a virtual 8-device CPU mesh so the suite needs no
TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# jax may already be imported by a sitecustomize that registers a TPU
# backend; the config update below still wins as long as no computation has
# run yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent XLA compilation cache: repeat suite runs skip recompiles
import fastvocoder_tpu  # noqa: E402

fastvocoder_tpu.enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE)


def reference_on_path():
    """Make the torch reference importable (with a scipy>=1.13 shim)."""
    import sys

    import scipy.signal
    from scipy.signal import windows as _w

    if not hasattr(scipy.signal, "kaiser"):
        scipy.signal.kaiser = _w.kaiser
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted"
)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
