#!/usr/bin/env python
"""Abundance histogram of a stoptag k-mer list.

Looks up every k-mer in <kmerfile> (one per line) against a saved
countgraph in one batched query, then writes

- ``<basename kmerfile>.counts`` — the k-mers with count > 1000;
- ``<figure>.countshist`` — per count value: count, multiplicity,
  cumulative k-mers, cumulative abundance mass;
- ``<figure>`` — a matplotlib cumulative histogram when matplotlib is
  available (skipped silently otherwise).

Behavioral peer of the reference's stoptag abundance histogrammer.

usage: python sandbox/stoptag-abundance-hist.py <graph> <kmerfile> <figure>
"""

import argparse
import os
from collections import Counter

import numpy as np

from _sandbox import *  # noqa: F401,F403

from khmer_tpu import load_countgraph


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="histogram stoptag k-mer abundances")
    ap.add_argument("hashfile")
    ap.add_argument("kmerfile")
    ap.add_argument("figure")
    args = ap.parse_args(argv)

    graph = load_countgraph(args.hashfile)

    with open(args.kmerfile) as fp:
        kmers = [line.strip() for line in fp if line.strip()]

    # one batched lookup for the whole list
    hashes = np.array([graph.hash(s) for s in kmers], dtype=np.uint64)
    counts = graph.get_counts_for_hashes(hashes) if len(hashes) else []

    with open(os.path.basename(args.kmerfile) + ".counts", "w") as out:
        for seq, count in zip(kmers, counts):
            if count > 1000:
                print(seq, int(count), file=out)

    hist = Counter(int(c) for c in counts)
    with open(args.figure + ".countshist", "w") as out:
        n_sofar = 0
        mass_sofar = 0
        for value in sorted(hist):
            n_sofar += hist[value]
            mass_sofar += value * hist[value]
            print(value, hist[value], n_sofar, mass_sofar, file=out)

    try:
        import matplotlib

        matplotlib.use("Agg")
        from pylab import hist as mpl_hist, savefig
    except ImportError:
        return
    mpl_hist([int(c) for c in counts], density=True, cumulative=True,
             bins=100, range=(1, 1000))
    savefig(args.figure)


if __name__ == "__main__":
    main()
