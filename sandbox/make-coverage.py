#!/usr/bin/env python
"""Annotate database sequences with mapped-read RPKM coverage.

Counts hits per database sequence from a SAM-like tab-separated
mapping file (target name in column 3), converts to RPKM, and rewrites
the database FASTA with "[cov=N]" appended to each name. Behavioral
contract of reference sandbox/make-coverage.py:38-76.

% python sandbox/make-coverage.py <db.fa> <mapfile>
"""

import collections
import sys

from _sandbox import iter_records

PROGRESS_EVERY = 100000


def _progress(label, n):
    if n % PROGRESS_EVERY == 0:
        print(label, n)


def read_db_lengths(dbfile):
    """Map database sequence name -> sequence length."""
    out = {}
    for n, record in enumerate(iter_records(dbfile)):
        _progress('...', n)
        out[record.name] = len(record.sequence)
    return out


def tally_hits(mapfile):
    """Count mapped reads per target; returns (hits, total_lines)."""
    hits = collections.Counter()
    total = 0
    with open(mapfile) as fp:
        for total, line in enumerate(fp):
            _progress('... 2x', total)
            hits[line.split('\t')[2]] += 1
    return hits, total


def rpkm_table(hits, lengths, mapped_reads):
    """reads-per-kilobase-per-million for every hit target."""
    scale = mapped_reads / 1e6
    return {name: count * (1000.0 / lengths[name]) * scale
            for name, count in hits.items()}


def main():
    dbfile, mapfile = sys.argv[1], sys.argv[2]
    lengths = read_db_lengths(dbfile)
    hits, mapped_reads = tally_hits(mapfile)
    rpkms = rpkm_table(hits, lengths, mapped_reads)

    with open(dbfile + '.cov', 'w') as outfp:
        for n, record in enumerate(iter_records(dbfile)):
            _progress('...', n)
            outfp.write(">%s[cov=%d]\n%s\n"
                        % (record.name, rpkms.get(record.name, 0),
                           record.sequence))


if __name__ == '__main__':
    main()
