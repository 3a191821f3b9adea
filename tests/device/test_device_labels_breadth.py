"""Device-tier re-run of tests/test_labels_breadth.py (see conftest)."""

from tests.test_labels_breadth import *  # noqa: F401,F403
