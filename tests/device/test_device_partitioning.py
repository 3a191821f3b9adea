"""Device-tier re-run of tests/test_partitioning.py (see conftest)."""

from tests.test_partitioning import *  # noqa: F401,F403
