"""Test configuration: hermetic CPU JAX with an 8-device virtual mesh.

Real-TPU benchmarking happens in bench.py, not in unit tests.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu";
# unit tests must run hermetically on the virtual 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's big fused programs
# (align_full, the BFC spectrum walk, the string-graph kernels) compile
# once per machine instead of once per pytest process.  Measured on the
# config-3 assembly test: 49s cold -> 14s warm.
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

REFERENCE_DATA = "/root/reference/tests/data"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def ref_data_dir():
    return REFERENCE_DATA


@pytest.fixture(scope="session")
def tiny_fa():
    return os.path.join(REFERENCE_DATA, "tiny.fa")
