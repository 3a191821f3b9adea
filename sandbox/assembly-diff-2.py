#!/usr/bin/env python
"""Streaming assembly diff: what does assembly 2 add over assembly 1?

Phase 1 loads assembly 1 into a Bloom sketch; phase 2 streams
assembly 2, emitting every window of >= 100 bp whose k-mers are >= 90%
novel against everything seen so far (assembly 1 plus the already-
scanned prefix of assembly 2 — each record is consumed after its
novel windows are extracted, so repeats inside assembly 2 only count
once).  Novel windows land in ``<basename assembly2>.uniq``.

Behavioral peer of the reference's second-generation assembly-diff
(k=20, 4x4e9 Bloom, extract_unique_paths semantics).

usage: python sandbox/assembly-diff-2.py <assembly1> <assembly2>
"""

import argparse
import os

from _sandbox import emit_fasta, iter_records, ticker

from khmer_tpu import Nodegraph

K = 20
TABLE_SIZE = int(4e9)
N_TABLES = 4
WINDOW_MIN_BP = 100
NOVEL_FRACTION = 0.9


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="extract >=%dbp windows of assembly2 that are "
                    ">=%d%% novel" % (WINDOW_MIN_BP,
                                      100 * NOVEL_FRACTION))
    ap.add_argument("assembly1")
    ap.add_argument("assembly2")
    args = ap.parse_args(argv)

    sketch = Nodegraph(K, TABLE_SIZE, N_TABLES)

    tick1 = ticker(fmt="... %d " + args.assembly1)
    for record in iter_records(args.assembly1):
        tick1()
        sketch.consume(record.cleaned_seq)

    uniq_path = os.path.basename(args.assembly2) + ".uniq"
    tick2 = ticker(fmt="... %d " + args.assembly2)
    n_paths = 0
    with open(uniq_path, "w") as out:
        for record in iter_records(args.assembly2):
            tick2()
            seq = record.cleaned_seq
            novel = sketch.extract_unique_paths(seq, WINDOW_MIN_BP,
                                                NOVEL_FRACTION)
            sketch.consume(seq)
            for window in novel:
                n_paths += 1
                emit_fasta(out, "%d from:%s" % (n_paths, record.name),
                           window)


if __name__ == "__main__":
    main()
