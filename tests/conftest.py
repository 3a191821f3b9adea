"""Test configuration: force a virtual 8-device CPU mesh.

Tests never require TPU hardware; the multi-chip sharding paths run on
8 virtual CPU devices (the driver separately dry-runs the real mesh).
Must set XLA flags before jax is imported anywhere.
"""

import os

# the axon environment pre-sets JAX_PLATFORMS=axon (the tunneled TPU);
# tests must override it — eager dispatch over the tunnel is ~60ms/op.
os.environ["JAX_PLATFORMS"] = os.environ.get("KHMER_TPU_TEST_PLATFORM",
                                             "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# persistent compile cache makes repeat test runs fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import pytest  # noqa: E402

# The axon plugin routes numpy->jax transfers to the tunneled TPU even when
# JAX_PLATFORMS=cpu; pin the default device so all test arrays stay on CPU.
import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])


REFERENCE_DATA = "/root/reference/tests/test-data"
REFERENCE_BIGDATA = "/root/reference/data"


def reference_file(name):
    path = os.path.join(REFERENCE_DATA, name)
    if not os.path.exists(path):
        pytest.skip("reference test data %s not available" % name)
    return path


@pytest.fixture
def tmpfile(tmp_path):
    def make(name):
        return str(tmp_path / name)

    return make
