#!/usr/bin/env python
"""Slice a read set by median-coverage band.

Keeps reads whose median k-mer count against a saved countgraph lies
in [min-coverage, max-coverage] (either bound optional, at least one
required).  Medians come from the framework's batched engine — one
native call per window of reads (behavioral peer of the reference's
coverage slicer; reads shorter than k are dropped like its
zero-count-array skip).

usage: python sandbox/slice-reads-by-coverage.py [-m MIN] [-M MAX]
           <graph> <reads-in> <reads-out>
"""

import argparse
import sys

from _sandbox import record_windows, write_record

from khmer_tpu import load_countgraph
from khmer_tpu.core import hostengine


def window_medians(graph, window):
    """Per-record medians for one window; -1 marks reads < k."""
    if hostengine.use_host_for(graph, "graph"):
        codes, starts, ends, _ = hostengine.pack_records(window)
        meds, _avg, _std = hostengine.median_counts(graph, codes,
                                                    starts, ends)
        return [int(m) for m in meds]
    out = []
    for record in window:
        try:
            med, _, _ = graph.get_median_count(record.cleaned_seq)
            out.append(int(med))
        except ValueError:
            out.append(-1)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="keep reads with median coverage in a band")
    ap.add_argument("-m", "--min-coverage", type=int, default=None)
    ap.add_argument("-M", "--max-coverage", type=int, default=None)
    ap.add_argument("input_count_graph")
    ap.add_argument("input_readfile")
    ap.add_argument("output_readfile")
    args = ap.parse_args(argv)

    print("min_coverage: %s" % args.min_coverage, file=sys.stderr)
    print("max_coverage: %s" % args.max_coverage, file=sys.stderr)

    if not (args.min_coverage or args.max_coverage):
        print("neither min nor max coverage specified!? exiting!",
              file=sys.stderr)
        sys.exit(1)
    if args.min_coverage and args.max_coverage and \
            args.max_coverage < args.min_coverage:
        print("min_coverage > max_coverage!? exiting!", file=sys.stderr)
        sys.exit(1)

    graph = load_countgraph(args.input_count_graph)
    lo, hi = args.min_coverage, args.max_coverage

    n_seen = 0
    n_kept = 0
    with open(args.output_readfile, "w") as out:
        for window in record_windows(args.input_readfile, 16384):
            meds = window_medians(graph, window)
            for record, med in zip(window, meds):
                n_seen += 1
                if n_seen % 100000 == 0:
                    print("...", n_seen, n_kept, file=sys.stderr)
                if med < 0:
                    continue
                if lo and med < lo:
                    continue
                if hi and med > hi:
                    continue
                n_kept += 1
                write_record(record, out)

    print("consumed %d reads; kept %d" % (n_seen, n_kept),
          file=sys.stderr)


if __name__ == "__main__":
    main()
