#!/usr/bin/env python
"""Thin launcher for khmer_tpu.cli.find_knots (khmer-compatible CLI name)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
from khmer_tpu.cli.find_knots import main

if __name__ == "__main__":
    main()
