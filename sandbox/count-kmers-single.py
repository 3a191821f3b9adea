#!/usr/bin/env python
"""
Produce k-mer counts for all the k-mers in the given sequence file,
counting them in-process first.

Sandbox-tier equivalent of reference sandbox/count-kmers-single.py:44-129;
the reference's N counting threads over a shared ReadParser become the
flat-stream batched device pipeline (khmer_tpu.core.pipeline).

% python sandbox/count-kmers-single.py <fasta/fastq>

Use '-h' for parameter help.
"""

import argparse
import csv
import sys

from _sandbox import iter_records  # noqa: F401

from khmer_tpu import Countgraph
from khmer_tpu.cli.args import (add_threading_args, build_counting_args,
                                info)
from khmer_tpu.utils.kfile import check_input_files


def get_parser():
    parser = build_counting_args(
        descr="Output abundances of the k-mers in the sequence file.")
    add_threading_args(parser)

    parser.add_argument('input_sequence_filename', help='The input'
                        ' FAST[AQ] sequence file.')

    parser.add_argument('-o', '--out', metavar="output_file",
                        dest='output_file',
                        type=argparse.FileType('w'),
                        default=None, help='output counts to this file')

    return parser


def main():
    info('count-kmers-single.py', ['counting'])
    args = get_parser().parse_args()

    check_input_files(args.input_sequence_filename, False)

    print('making k-mer countgraph', file=sys.stderr)
    countgraph = Countgraph(args.ksize, args.max_tablesize, args.n_tables)

    kmer_size = countgraph.ksize()

    print('kmer_size: %s' % countgraph.ksize(), file=sys.stderr)
    print('k-mer countgraph sizes: %s' % (countgraph.hashsizes(),),
          file=sys.stderr)

    if args.output_file is None:
        args.output_file = sys.stdout
    writer = csv.writer(args.output_file)

    print('consuming input, round 1 -- %s' % args.input_sequence_filename,
          file=sys.stderr)
    countgraph.consume_seqfile(args.input_sequence_filename)

    seen = set()
    for record in iter_records(args.input_sequence_filename):
        seq = record.sequence.replace('N', 'A')
        if len(seq) < kmer_size:
            continue
        hashes = countgraph._hashes_for_sequence(seq)
        counts = countgraph.get_counts_for_hashes(hashes)
        for i, (h, c) in enumerate(zip(hashes.tolist(), counts.tolist())):
            if h not in seen:
                seen.add(h)
                writer.writerow([seq[i:i + kmer_size], str(c)])

    print('Total number of unique k-mers: {0}'.format(
        countgraph.n_unique_kmers()), file=sys.stderr)


if __name__ == '__main__':
    main()
