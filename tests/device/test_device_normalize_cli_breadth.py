"""Device-tier re-run of tests/test_normalize_cli_breadth.py (see conftest)."""

from tests.test_normalize_cli_breadth import *  # noqa: F401,F403
