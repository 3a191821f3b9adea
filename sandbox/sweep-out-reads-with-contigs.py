#!/usr/bin/env python
"""Partition reads by which assembled contig they connect to.

Behavioral peer of the reference's contig sweeper (reference
sandbox/sweep-out-reads-with-contigs.py:44-69): every contig k-mer is
tagged (tag density 0), the contig graph is partitioned, and the reads
file is annotated with the partition of whichever contig each read
touches (unassigned reads included).

usage: python sandbox/sweep-out-reads-with-contigs.py <reads> <contigs>
       [out]
"""

import argparse
import os
import sys

from _sandbox import *  # noqa: F401,F403

from khmer_tpu import Nodegraph

K = 20
TABLE = 1e7


def contig_partitions(contigfile):
    """Bloom graph with every contig k-mer tagged and partitioned."""
    graph = Nodegraph(K, TABLE, 4)
    graph._set_tag_density(0)
    print('loading contigs from', contigfile, file=sys.stderr)
    graph.consume_seqfile_and_tag(contigfile)
    graph.merge_subset(graph.do_subset_partition(0, 0))
    return graph


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('reads')
    ap.add_argument('contigs')
    ap.add_argument('out', nargs='?', default=None)
    args = ap.parse_args()

    out = args.out or os.path.basename(args.reads) + '.sweep'
    graph = contig_partitions(args.contigs)
    print('outputting contig-partitioned reads to', out,
          file=sys.stderr)
    graph.output_partitions(args.reads, out, True)


if __name__ == '__main__':
    main()
