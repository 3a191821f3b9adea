#!/usr/bin/env python
"""Keep only reads that sit inside a big connected component.

Builds a Bloom de Bruijn graph over the input, then walks the
component around each read's first k-mer (bounded at the threshold —
the walk stops as soon as 500 nodes are reachable) and emits the read
iff the bound is hit.  Behavioral peer of the reference's graph-size
filter (K=32, 4x4e6 Bloom, threshold 500); the threaded worker pool it
used is replaced by the framework's bounded component walk.

usage: python sandbox/graph-size.py <input> [<output>]
"""

import argparse
import os

from _sandbox import emit_fasta, iter_records, ticker

from khmer_tpu import Nodegraph

K = 32
TABLE_SIZE = int(4e6)
N_TABLES = 4
THRESHOLD = 500


def component_reaches(graph, kmer, threshold):
    """True iff >= threshold nodes are reachable from kmer."""
    return graph.calc_connected_graph_size(kmer, threshold) >= threshold


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="filter reads by connected-component size")
    ap.add_argument("input")
    ap.add_argument("output", nargs="?", default=None)
    args = ap.parse_args(argv)

    outname = args.output or os.path.basename(args.input) + ".graphsize"
    print("input file to graphsize filter: %s" % args.input)
    print("filtering to output:", outname)
    print("-- settings:")
    print("K", K)
    print("HASHTABLE SIZE %g" % TABLE_SIZE)
    print("N HASHTABLES %d" % N_TABLES)
    print("THRESHOLD", THRESHOLD)
    print("--")

    graph = Nodegraph(K, TABLE_SIZE, N_TABLES)
    print("eating fa", args.input)
    graph.consume_seqfile(args.input)

    tick = ticker(fmt="... filtering %d")
    kept = 0
    with open(outname, "w") as out:
        for record in iter_records(args.input):
            tick()
            if len(record.sequence) < K:
                continue
            if component_reaches(graph, record.sequence[:K], THRESHOLD):
                kept += 1
                emit_fasta(out, record.name, record.sequence)
    print("kept %d reads with component >= %d" % (kept, THRESHOLD))


if __name__ == "__main__":
    main()
