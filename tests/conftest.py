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


# ---------------------------------------------------------------------------
# Persistent-cache guard for interpret-mode Pallas tests.
#
# Serializing an interpret-mode pallas_call executable for the
# persistent compilation cache SEGFAULTS in this jax/XLA build (the
# crash is inside put_executable_and_time / the later read of such an
# entry — reproduced twice on cold caches, r5).  The warm cache masked
# it for rounds 2-4 because the entries already existed and were never
# re-serialized.  The interpret twins only run in these test modules,
# so the persistent cache is disabled for them; their XLA reference
# programs recompile in seconds.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

_PALLAS_INTERPRET_MODULES = {
    "test_ops", "test_fm_pallas", "test_sw_banded",
}


@pytest.fixture(autouse=True)
def _pallas_interpret_cache_guard(request):
    mod = getattr(request.module, "__name__", "")
    if mod in _PALLAS_INTERPRET_MODULES:
        old = jax.config.jax_compilation_cache_dir
        jax.config.update("jax_compilation_cache_dir", None)
        try:
            yield
        finally:
            jax.config.update("jax_compilation_cache_dir", old)
    else:
        yield
