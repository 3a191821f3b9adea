"""Device-tier re-run of tests/test_nodegraph_behavior.py (see conftest)."""

from tests.test_nodegraph_behavior import *  # noqa: F401,F403
