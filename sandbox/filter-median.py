#!/usr/bin/env python
"""Randomly downsample reads to a target coverage, judged by median
k-mer count against a saved countgraph: a read with median m survives
with probability min(1, C/m). Output lands in <infile>.medfilt.

Behavioral peer of the reference's median downsampler (reference
sandbox/filter-median.py:45-98); its thread pool is replaced by the
framework's batched median path — one native hg_median_counts call
per record window (scalar fallback when the host tier is absent).

usage: python sandbox/filter-median.py -C 20 <counting.ct> <data> [...]
"""

import os
import random

from _sandbox import emit_fasta, record_windows

from khmer_tpu import load_countgraph
from khmer_tpu.cli.args import build_counting_args


def coin(median, coverage):
    """Keep decision: uniform draw over 1..median vs the target."""
    return random.randint(1, max(median, 1)) <= coverage


def window_medians(graph, window):
    """Median k-mer count per record — ONE native call per window
    when the host tier is up, scalar fallback otherwise."""
    from khmer_tpu.core import hostengine

    if hostengine.use_host_for(graph, "graph"):
        codes, starts, ends, _ = hostengine.pack_records(window)
        med, _avg, _std = hostengine.median_counts(
            graph, codes, starts, ends)
        if any(m < 0 for m in med):
            # reads shorter than k: error out exactly like the scalar
            # tier's get_median_count (and the reference script)
            raise ValueError("read length must be >= the k-mer size")
        return [int(m) for m in med]
    return [graph.get_median_count(r.sequence)[0] for r in window]


def downsample(graph, infile, coverage):
    target = os.path.basename(infile) + '.medfilt'
    with open(target, 'w') as out:
        for window in record_windows(infile):
            for record, med in zip(window, window_medians(graph,
                                                          window)):
                if coin(med, coverage):
                    emit_fasta(out, record.name, record.sequence)
    return target


def main():
    ap = build_counting_args()
    ap.add_argument('--coverage', '-C', type=int, default=20)
    ap.add_argument('input_table')
    ap.add_argument('input_filenames', nargs='+')
    args = ap.parse_args()

    print('file with ht: %s' % args.input_table)
    print('loading hashtable')
    graph = load_countgraph(args.input_table)
    print("K:", graph.ksize())
    for infile in args.input_filenames:
        print('filtering', infile)
        out = downsample(graph, infile, args.coverage)
        print('output in', out)


if __name__ == '__main__':
    main()
