"""Device-tier re-run of tests/test_stoptags.py (see conftest)."""

from tests.test_stoptags import *  # noqa: F401,F403
