#!/usr/bin/env python
"""Split a FASTA/FASTQ file into numbered chunks of <size> records:
<prefix>.0000.fa, <prefix>.0001.fa, ...

Behavioral peer of the reference's splitter (reference
sandbox/split-fasta.py:41-58), rebuilt on the framework parser.

usage: python sandbox/split-fasta.py <file> <prefix> <size>
"""

import argparse

from _sandbox import emit_fasta, iter_records, ticker


def chunked_writers(prefix, size, records):
    """Yield (division, open-file) transitions while streaming records
    out; a new numbered file opens every `size` records."""
    tick = ticker(100000)
    fp = None
    for n, record in enumerate(records):
        tick()
        if n % size == 0:
            if fp is not None:
                fp.close()
            name = '%s.%04d.fa' % (prefix, n // size)
            print('opening', name)
            fp = open(name, 'w')
        emit_fasta(fp, record.name, record.sequence)
    if fp is not None:
        fp.close()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('infile')
    ap.add_argument('prefix')
    ap.add_argument('size', type=float, help='records per chunk, e.g. 1e9')
    args = ap.parse_args()
    chunked_writers(args.prefix, int(args.size),
                    iter_records(args.infile))


if __name__ == '__main__':
    main()
