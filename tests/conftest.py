"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

This is the TPU-native analog of a fake distributed backend (SURVEY.md §4.5):
``xla_force_host_platform_device_count=8`` gives every test a multi-device
mesh to validate shardings without TPU hardware.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# NOTE: this container pins JAX_PLATFORMS=axon via sitecustomize, so the env
# var cannot be overridden — jax.config is the only effective switch.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


# ---------------------------------------------------------------------------
# De-flake: when orbax (-> grpc/absl) was imported anywhere in the session,
# CPython interpreter teardown aborts ("Fatal Python error: Aborted" in grpc's
# background threads) roughly 1 in 3 full-suite runs.  All test results and
# the terminal summary are already written by pytest_unconfigure time, so skip
# the doomed interpreter teardown with a hard exit carrying the real status.
_EXIT_STATUS = [0]


def pytest_sessionfinish(session, exitstatus):
    _EXIT_STATUS[0] = int(exitstatus)


def pytest_unconfigure(config):
    if "grpc" not in sys.modules or os.environ.get("ECOSEG_NO_HARD_EXIT"):
        return
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(_EXIT_STATUS[0])
