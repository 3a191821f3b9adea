#!/usr/bin/env python
"""Histogram of per-read median k-mer counts against a saved
countgraph, with cumulative counts and fractions.

Sandbox-tier equivalent of reference
sandbox/calc-median-distribution.py:38-90.

% python sandbox/calc-median-distribution.py <graph> <seqfile> <histout>
"""

import argparse

from _sandbox import iter_records

from khmer_tpu import load_countgraph


def main():
    parser = argparse.ArgumentParser(
        description="Output k-mer abundance distribution.")

    parser.add_argument('hashname')
    parser.add_argument('seqfile')
    parser.add_argument('histout')

    args = parser.parse_args()

    outfp = open(args.histout, 'w')

    print('hashtable from', args.hashname)
    ht = load_countgraph(args.hashname)

    hist = {}

    for i in range(65536):
        hist[i] = 0

    for n, record in enumerate(iter_records(args.seqfile)):
        if n > 0 and n % 100000 == 0:
            print('...', n)

        seq = record.sequence.replace('N', 'A')

        try:
            med, _, _ = ht.get_median_count(seq)
        except ValueError:
            continue

        hist[med] = hist[med] + 1

    histlist = list(hist.items())
    histlist.sort()

    sumk = sum(hist.values())

    sofar = 0
    for n, m in histlist:
        sofar += m
        percent = float(sofar) / sumk
        outfp.write('%d %d %d %.3f\n' % (n, m, sofar, percent))
    outfp.close()


if __name__ == '__main__':
    main()
