"""Device-tier re-run of tests/test_script_arguments.py (see conftest)."""

from tests.test_script_arguments import *  # noqa: F401,F403
