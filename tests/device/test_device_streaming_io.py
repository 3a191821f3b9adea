"""Device-tier re-run of tests/test_streaming_io.py (see conftest)."""

from tests.test_streaming_io import *  # noqa: F401,F403
