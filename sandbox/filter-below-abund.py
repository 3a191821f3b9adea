#!/usr/bin/env python
"""Trim reads at k-mers ABOVE abundance 50 against a saved countgraph
(the complement of filter-abund) — output <infile>.below per input, in
the working directory.

Behavioral peer of the reference's high-abundance filter (reference
sandbox/filter-below-abund.py:38-83): reads containing N are dropped,
a read is kept iff its trim-below point is >= k. The reference's
thread pool is replaced by plain windowed streaming (order
preserved); the trim predicate itself runs per record on the
dispatched engine.

usage: python sandbox/filter-below-abund.py <countgraph> <data1> [...]
"""

import argparse
import os

from _sandbox import emit_fasta, record_windows

from khmer_tpu import load_countgraph

CEILING = 50


def survivors(graph, window):
    """Yield (name, trimmed-seq) for the window's passing reads."""
    k = graph.ksize()
    for record in window:
        seq = record.sequence
        if 'N' in seq:
            continue
        kept, cut_at = graph.trim_below_abundance(seq, CEILING)
        if cut_at >= k:
            yield record.name, kept


def filter_file(graph, infile):
    target = os.path.basename(infile) + '.below'
    with open(target, 'w') as out:
        for window in record_windows(infile):
            for name, seq in survivors(graph, window):
                emit_fasta(out, name, seq)
    return target


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('countgraph')
    ap.add_argument('inputs', nargs='+')
    args = ap.parse_args()

    print('file with ht: %s' % args.countgraph)
    print('making hashtable')
    graph = load_countgraph(args.countgraph)
    for infile in args.inputs:
        print('filtering', infile)
        filter_file(graph, infile)


if __name__ == '__main__':
    main()
