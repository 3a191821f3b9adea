#!/usr/bin/env python
"""
Accept or discard sequences, randomly downsampling by median k-mer
count against the given countgraph. Output sequences are placed in
'infile.medfilt'.

Sandbox-tier equivalent of reference sandbox/filter-median.py:45-98.

% python sandbox/filter-median.py <counting.ct> <data1> [ <data2> <...> ]

Use '-h' for parameter help.
"""

import os
import random

from _sandbox import *  # noqa: F401,F403

from khmer_tpu import load_countgraph
from khmer_tpu.cli.args import build_counting_args
from khmer_tpu.utils.thread_utils import (ThreadedSequenceProcessor,
                                          verbose_loader)

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

    def process_fn(record):
        name = record.name
        seq = record.sequence

        med, avg, dev = ht.get_median_count(seq)

        if random.randint(1, med) > args.coverage:
            return None, None

        return name, seq

    for infile in infiles:
        print('filtering', infile)
        outfile = os.path.basename(infile) + '.medfilt'
        outfp = open(outfile, 'w')

        tsp = ThreadedSequenceProcessor(process_fn)
        tsp.start(verbose_loader(infile), outfp)

        print('output in', outfile)


if __name__ == '__main__':
    main()
