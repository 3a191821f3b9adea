"""Device-tier re-run of tests/test_scripts_counting.py (see conftest)."""

from tests.test_scripts_counting import *  # noqa: F401,F403
