"""Device-tier re-run of tests/test_filter_abund_breadth.py (see conftest)."""

from tests.test_filter_abund_breadth import *  # noqa: F401,F403
