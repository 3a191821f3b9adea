"""Device-tier re-run of tests/test_dbg_fixtures.py (see conftest)."""

from tests.test_dbg_fixtures import *  # noqa: F401,F403
