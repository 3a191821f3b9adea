"""Device-tier re-run of tests/test_consume_with_mask.py (see conftest)."""

from tests.test_consume_with_mask import *  # noqa: F401,F403
