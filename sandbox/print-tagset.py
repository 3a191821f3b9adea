#!/usr/bin/env python
"""Dump a saved tagset to text: one k-mer string per line.

Sandbox-tier equivalent of reference sandbox/print-tagset.py:42-48 —
loads <tagset> into a k=32 Nodegraph shell and writes
basename(<tagset>).txt in the current directory.

% python sandbox/print-tagset.py <tagset-file>
"""

import os
import sys

from _sandbox import *  # noqa: F401,F403

from khmer_tpu import Nodegraph


def main():
    ht = Nodegraph(32, 1, 1)
    ht.load_tagset(sys.argv[1])
    print('loaded!')
    ht.print_tagset(os.path.basename(sys.argv[1]) + '.txt')


if __name__ == '__main__':
    main()
