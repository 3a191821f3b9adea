#!/usr/bin/env python
"""Keep reads whose median k-mer coverage (against a saved countgraph)
falls within [min-coverage, max-coverage].

Sandbox-tier equivalent of reference sandbox/slice-reads-by-coverage.py:36-101.

% python sandbox/slice-reads-by-coverage.py [-m MIN] [-M MAX] <graph> <in> <out>
"""

import argparse
import sys

from _sandbox import iter_records

from khmer_tpu import load_countgraph
from khmer_tpu.core.pipeline import counts_for_records


def output_single(read):
    if getattr(read, 'quality', None):
        return "@%s\n%s\n+\n%s\n" % (read.name, read.sequence, read.quality)
    return ">%s\n%s\n" % (read.name, read.sequence)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-m', '--min-coverage', type=int, default=None)
    parser.add_argument('-M', '--max-coverage', type=int, default=None)
    parser.add_argument('input_count_graph')
    parser.add_argument('input_readfile')
    parser.add_argument('output_readfile')
    args = parser.parse_args()

    print('min_coverage: %s' % args.min_coverage, file=sys.stderr)
    print('max_coverage: %s' % args.max_coverage, file=sys.stderr)

    if not (args.min_coverage or args.max_coverage):
        print("neither min nor max coverage specified!? exiting!",
              file=sys.stderr)
        sys.exit(1)

    if args.min_coverage and args.max_coverage and \
       args.max_coverage < args.min_coverage:
        print("min_coverage > max_coverage!? exiting!", file=sys.stderr)
        sys.exit(1)

    htable = load_countgraph(args.input_count_graph)
    output_fp = open(args.output_readfile, 'w')

    n_kept = 0
    n = 0
    # batched device path: median from the per-read count arrays
    for n, (record, counts) in enumerate(
            counts_for_records(htable, iter_records(args.input_readfile))):
        if n % 100000 == 0:
            print('...', n, n_kept, file=sys.stderr)

        if counts.size == 0:
            continue
        med = int(sorted(counts.tolist())[len(counts) // 2])

        keep = True
        if args.min_coverage and med < args.min_coverage:
            keep = False

        if args.max_coverage and med > args.max_coverage:
            keep = False

        if keep:
            n_kept += 1
            output_fp.write(output_single(record))

    print('consumed %d reads; kept %d' % (n, n_kept), file=sys.stderr)


if __name__ == '__main__':
    main()
