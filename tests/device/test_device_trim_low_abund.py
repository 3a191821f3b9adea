"""Device-tier re-run of tests/test_trim_low_abund.py (see conftest)."""

from tests.test_trim_low_abund import *  # noqa: F401,F403
