"""Device-tier re-run of tests/test_countgraph_behavior.py (see conftest)."""

from tests.test_countgraph_behavior import *  # noqa: F401,F403
