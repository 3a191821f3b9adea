"""Test configuration: force a virtual 8-device CPU mesh.

Tests never require TPU hardware; multi-chip sharding paths run on 8
virtual CPU devices (the driver separately dry-runs the real mesh).

The axon environment injects a sitecustomize that registers the
tunneled-TPU PJRT plugin at interpreter startup and forces
jax_platforms="axon,cpu" — overriding JAX_PLATFORMS env and freezing
XLA_FLAGS. The reliable override is the jax config API + a backend
reset (see khmer_tpu.parallel.virtual_devices).
"""

import os

os.environ["JAX_PLATFORMS"] = os.environ.get("KHMER_TPU_TEST_PLATFORM",
                                             "cpu")
# persistent compile cache makes repeat test runs fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import pytest  # noqa: E402

# Must run before khmer_tpu (whose import touches jax backends): inline
# equivalent of khmer_tpu.parallel.virtual_devices.force_cpu_devices.
import jax  # noqa: E402
from jax._src import xla_bridge as _xb  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    _xb._clear_backends()
except Exception:
    pass
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_device", jax.devices()[0])


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
