#!/usr/bin/env python
"""Dump a saved stoptags file to text: one k-mer string per line.

Behavioral peer of the reference's stoptag printer (reference
sandbox/print-stoptags.py:42-46); output lands as
basename(<stoptags>).txt in the working directory.

usage: python sandbox/print-stoptags.py <stoptags-file>
"""

import argparse
import os

from _sandbox import *  # noqa: F401,F403

from khmer_tpu import Nodegraph


def dump(path):
    shell = Nodegraph(32, 1, 1)
    shell.load_stop_tags(path)
    target = os.path.basename(path) + '.txt'
    shell.print_stop_tags(target)
    return target


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('stoptags')
    dump(ap.parse_args().stoptags)


if __name__ == '__main__':
    main()
