"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md section 4: multi-chip behavior is
validated with ``--xla_force_host_platform_device_count``). f64 is enabled so
parity tests can score windows in double precision exactly like the OpenCV
oracle (``tempcv.cpp:796`` accumulates in double).
"""

import os

# CLFD_TEST_TPU=1 keeps the real TPU backend so the Pallas-kernel suites
# (test_front_kernel / test_tail_kernel) run on hardware; default is the
# CPU virtual mesh.
_TPU = os.environ.get("CLFD_TEST_TPU") == "1"
if not _TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if not _TPU and "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _TPU:
    # The env var alone is not enough when a TPU plugin (axon) pre-set
    # JAX_PLATFORMS; the config update forces CPU deterministically.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
else:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

import pytest  # noqa: E402


REFERENCE_CASCADE_DIR = "/root/reference/CLFaceDetection"
if os.path.isdir(REFERENCE_CASCADE_DIR):
    os.environ.setdefault("CLFD_CASCADE_DIR", REFERENCE_CASCADE_DIR)


@pytest.fixture(scope="session")
def rng():
    import numpy as np
    return np.random.default_rng(1234)
