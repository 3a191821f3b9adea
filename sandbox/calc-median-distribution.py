#!/usr/bin/env python
"""Cumulative histogram of per-read median k-mer counts.

Sweeps a read set against a saved countgraph and writes, per observed
median value m: ``m  count(m)  cumulative  fraction``.  Medians come
from the framework's batched engine — one native call per window of
reads instead of one lookup per read (reference peer:
calc-median-distribution; host tier: hostengine.median_counts).

usage: python sandbox/calc-median-distribution.py <graph> <reads> <out>
"""

import argparse
from collections import Counter

from _sandbox import record_windows, ticker

from khmer_tpu import load_countgraph
from khmer_tpu.core import hostengine


def median_histogram(graph, seqfile, tick=None):
    """Counter of per-read median counts (reads < k are skipped)."""
    hist = Counter()
    for window in record_windows(seqfile):
        if hostengine.use_host_for(graph, "graph"):
            codes, starts, ends, _ = hostengine.pack_records(window)
            meds, _avg, _std = hostengine.median_counts(
                graph, codes, starts, ends)
            hist.update(int(m) for m in meds if m >= 0)
        else:
            for record in window:
                try:
                    med, _, _ = graph.get_median_count(
                        record.cleaned_seq)
                except ValueError:
                    continue
                hist[int(med)] += 1
        if tick:
            for _ in window:
                tick()
    return hist


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="per-read median-count distribution")
    ap.add_argument("hashname")
    ap.add_argument("seqfile")
    ap.add_argument("histout")
    args = ap.parse_args(argv)

    print("hashtable from", args.hashname)
    graph = load_countgraph(args.hashname)

    hist = median_histogram(graph, args.seqfile,
                            tick=ticker(100000, "... %d"))

    total = sum(hist.values())
    running = 0
    with open(args.histout, "w") as out:
        # one row per possible median value, zeros included
        # (MAX_BIGCOUNT+1 rows, like the reference's histogram files)
        for med in range(65536):
            running += hist.get(med, 0)
            out.write("%d %d %d %.3f\n"
                      % (med, hist.get(med, 0), running,
                         running / total))


if __name__ == "__main__":
    main()
