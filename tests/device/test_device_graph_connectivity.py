"""Device-tier re-run of tests/test_graph_connectivity.py (see conftest)."""

from tests.test_graph_connectivity import *  # noqa: F401,F403
