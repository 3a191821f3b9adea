"""Device-tier battery: re-runs the representative behavioral test
modules with KHMER_TPU_ENGINE=device, so the pod-scale device engines
(sketch_kernels/blocked/pipeline jits) are exercised by the same
oracles that guard the host tier — they can't rot behind it.

Each test_device_*.py module re-collects a sibling battery via
`from tests.test_X import *`; the autouse fixture below pins the
engine for every test in this directory (monkeypatch restores the
environment afterwards, so ordering never leaks into the host runs).
"""

import pytest


@pytest.fixture(autouse=True)
def _force_device_engine(monkeypatch):
    monkeypatch.setenv("KHMER_TPU_ENGINE", "device")
