#!/usr/bin/env python
"""Renumber long sequences under a common prefix.

Every record of >= 200 bp across the input files is written to stdout
as ``><prefix>.<serial> <original name>`` with the sequence wrapped at
80 columns.  (Behavioral peer of the reference's sandbox multi-rename;
records below the cutoff are dropped.)

usage: python sandbox/multi-rename.py <prefix> <file> [<file> ...]
"""

import argparse

from _sandbox import emit_fasta, iter_records

MIN_LEN = 200
WRAP = 80


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="renumber >=%dbp records under one prefix" % MIN_LEN)
    ap.add_argument("prefix")
    ap.add_argument("filenames", nargs="+")
    args = ap.parse_args(argv)

    import sys

    serial = 0
    for path in args.filenames:
        for record in iter_records(path):
            if len(record.sequence) < MIN_LEN:
                continue
            serial += 1
            emit_fasta(sys.stdout, "%s.%d %s" % (args.prefix, serial,
                                                 record.name),
                       record.sequence, wrap=WRAP)


if __name__ == "__main__":
    main()
