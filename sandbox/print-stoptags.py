#!/usr/bin/env python
"""Dump a saved stoptags file to text: one k-mer string per line.

Sandbox-tier equivalent of reference sandbox/print-stoptags.py:42-46.

% python sandbox/print-stoptags.py <stoptags-file>
"""

import os
import sys

from _sandbox import *  # noqa: F401,F403

from khmer_tpu import Nodegraph


def main():
    ht = Nodegraph(32, 1, 1)
    ht.load_stop_tags(sys.argv[1])
    ht.print_stop_tags(os.path.basename(sys.argv[1]) + '.txt')


if __name__ == '__main__':
    main()
