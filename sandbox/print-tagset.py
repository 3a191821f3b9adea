#!/usr/bin/env python
"""Dump a saved tagset to text: one k-mer string per line.

Behavioral peer of the reference's tagset printer (reference
sandbox/print-tagset.py:42-48): the tagset loads into a k=32 Bloom
shell and lands as basename(<tagset>).txt in the working directory.

usage: python sandbox/print-tagset.py <tagset-file>
"""

import argparse
import os

from _sandbox import *  # noqa: F401,F403

from khmer_tpu import Nodegraph


def dump(path):
    shell = Nodegraph(32, 1, 1)
    shell.load_tagset(path)
    print('loaded!')
    target = os.path.basename(path) + '.txt'
    shell.print_tagset(target)
    return target


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('tagset')
    dump(ap.parse_args().tagset)


if __name__ == '__main__':
    main()
