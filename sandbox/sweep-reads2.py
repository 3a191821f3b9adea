#!/usr/bin/env python
"""Use a set of query reads to sweep out overlapping reads from
another file (countgraph membership version).

Sandbox-tier equivalent of reference sandbox/sweep-reads2.py:52-105:
count the query reads into a countgraph, then keep each search read
(pair) whose median k-mer count is nonzero.

% python sandbox/sweep-reads2.py <query reads> <search reads>

Results end up in <search reads>.sweep2 (or -o).
"""

import os
import sys

from _sandbox import iter_records  # noqa: F401

from khmer_tpu.cli.args import build_counting_args, create_countgraph
from khmer_tpu.io.fastx import write_record, write_record_pair
from khmer_tpu.io.pairing import broken_paired_reader


def main():
    parser = build_counting_args(
        descr='Sweep out reads overlapping a query set')
    parser.add_argument('-o', '--outfile',
                        help='output file; default is "infile".sweep2')
    parser.add_argument('input_filename')
    parser.add_argument('read_filename')
    args = parser.parse_args()

    inp = args.input_filename
    readsfile = args.read_filename
    outfile = args.outfile or os.path.basename(readsfile) + '.sweep2'

    ht = create_countgraph(args)
    print('loading input reads from', inp, file=sys.stderr)
    ht.consume_seqfile(inp)

    print('starting sweep.', file=sys.stderr)
    m = 0
    with open(outfile, 'w') as outfp:
        for n, is_pair, read1, read2 in \
                broken_paired_reader(iter_records(readsfile)):
            if n % 10000 == 0:
                print('...', n, m, file=sys.stderr)
            if is_pair:
                count1 = ht.get_median_count(read1.sequence)[0]
                count2 = ht.get_median_count(read2.sequence)[0]
                if count1 or count2:
                    m += 1
                    write_record_pair(read1, read2, outfp)
            else:
                count = ht.get_median_count(read1.sequence)[0]
                if count:
                    m += 1
                    write_record(read1, outfp)


if __name__ == '__main__':
    main()
