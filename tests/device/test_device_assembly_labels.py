"""Device-tier re-run of tests/test_assembly_labels.py (see conftest)."""

from tests.test_assembly_labels import *  # noqa: F401,F403
