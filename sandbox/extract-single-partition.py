#!/usr/bin/env python
"""Extract the reads of one partition from a partition-annotated FASTA
(the '.part' output of do-partition / output_partitions) to stdout.

Behavioral peer of the reference's single-partition extractor
(reference sandbox/extract-single-partition.py:40-60).

usage: python sandbox/extract-single-partition.py <file.part> <pid>
"""

import argparse
import sys

from _sandbox import iter_records, ticker


def partition_of(record):
    """Partition id from a '.part' annotated record name."""
    return int(record.name.rsplit('\t', 1)[1])


def extract(partfile, want, out=sys.stdout, log=sys.stderr):
    tick = ticker(10000, fmt='...%d', out=log)
    hits = 0
    for record in iter_records(partfile):
        if partition_of(record) == want:
            out.write('>%s\n%s\n' % (record.name, record.sequence))
            hits += 1
        tick()
    log.write('found %d total in partition %d\n' % (hits, want))
    return hits


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('partfile')
    ap.add_argument('pid', type=int)
    args = ap.parse_args()
    extract(args.partfile, args.pid)


if __name__ == '__main__':
    main()
