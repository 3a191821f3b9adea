#!/usr/bin/env python
"""
Accept or discard sequences by median k-mer count and coefficient of
variation; writes 'infile.medpctfilt' plus a per-read stats file
'infile.medpctfilt.stats'.

Sandbox-tier equivalent of reference sandbox/filter-median-and-pct.py:45-109.

% python sandbox/filter-median-and-pct.py <counting.ct> <data1> [...]

Use '-h' for parameter help.
"""

import os
import random

from _sandbox import iter_records

from khmer_tpu import load_countgraph
from khmer_tpu.cli.args import build_counting_args

DEFAULT_COVERAGE = 20


def main():
    parser = build_counting_args()
    parser.add_argument('--coverage', '-C', dest='coverage',
                        default=DEFAULT_COVERAGE, type=int)
    parser.add_argument('input_table')
    parser.add_argument('input_filenames', nargs='+')
    args = parser.parse_args()

    counting_ht = args.input_table
    infiles = args.input_filenames

    print('file with ht: %s' % counting_ht)

    print('loading hashtable')
    ht = load_countgraph(counting_ht)
    ksize = ht.ksize()

    print("K:", ksize)

    for infile in infiles:
        print('filtering', infile)
        statsfp = open(os.path.basename(infile) + '.medpctfilt.stats', 'w')
        outfile = os.path.basename(infile) + '.medpctfilt'
        outfp = open(outfile, 'w')

        for n, record in enumerate(iter_records(infile)):
            if n % 100000 == 0:
                print('...', n)

            name = record.name
            seq = record.sequence

            med, avg, dev = ht.get_median_count(seq)
            pct = dev / avg * 100 if avg else 0

            statsfp.write('%s %s %s %s %s\n' % (med, avg, dev, pct, name))

            if random.randint(1, med) > args.coverage or pct > 100:
                continue

            print('>%s\n%s' % (name, seq), file=outfp)

        print('output in', outfile)


if __name__ == '__main__':
    main()
