#!/usr/bin/env python
"""Histogram stoptag k-mer abundances against a saved countgraph;
writes <seqfile>.counts (k-mers with count > 1000) and
<figure>.countshist (cumulative histogram), plus a matplotlib PNG
when matplotlib is importable.

Sandbox-tier equivalent of reference sandbox/stoptag-abundance-hist.py:36-79.

% python sandbox/stoptag-abundance-hist.py <graph> <kmerfile> <figure>
"""

import os
import sys

from _sandbox import *  # noqa: F401,F403

from khmer_tpu import load_countgraph

try:
    import matplotlib
    matplotlib.use('Agg')
    from pylab import hist, savefig
    HAVE_MPL = True
except ImportError:
    HAVE_MPL = False


def main():
    hashfile = sys.argv[1]
    filename = sys.argv[2]
    figure = sys.argv[3]

    ht = load_countgraph(hashfile)

    outabund = open(os.path.basename(filename) + '.counts', 'w')

    counts = []
    d = {}
    for sequence in open(sys.argv[2]):
        sequence = sequence.strip()

        count = ht.get(sequence)
        counts.append(count)
        d[count] = d.get(count, 0) + 1

        if count > 1000:
            print(sequence, count, file=outabund)

    outfp = open(figure + '.countshist', 'w')
    sofar = 0
    sofar_cumu = 0
    for k in sorted(d.keys()):
        sofar += d[k]
        sofar_cumu += k * d[k]
        print(k, d[k], sofar, sofar_cumu, file=outfp)

    if HAVE_MPL:
        hist(counts, density=True, cumulative=True, bins=100,
             range=(1, 1000))
        savefig(figure)


if __name__ == '__main__':
    main()
