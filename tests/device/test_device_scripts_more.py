"""Device-tier re-run of tests/test_scripts_more.py (see conftest)."""

from tests.test_scripts_more import *  # noqa: F401,F403
