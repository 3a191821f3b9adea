#!/usr/bin/env python
"""
Produce k-mer counts for all the k-mers in the given sequence file,
using the given countgraph.

Sandbox-tier equivalent of reference sandbox/count-kmers.py:44-103,
with the per-k-mer Python loop replaced by batched device hashing +
count lookups (first-seen canonical k-mers deduped on host).

% python sandbox/count-kmers.py <ct> <fasta/fastq> [ <fasta/fastq> ... ]

Use '-h' for parameter help.
"""

import argparse
import csv
import sys

from _sandbox import iter_records  # noqa: F401

from khmer_tpu import load_countgraph
from khmer_tpu.cli.args import info


def get_parser():
    parser = argparse.ArgumentParser(
        description="Output abundances of the k-mers in "
        "the sequence files using a pre-made k-mer countgraph.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)

    parser.add_argument('input_count_graph_filename', help='The name of the'
                        ' input k-mer countgraph file.')
    parser.add_argument('input_sequence_filenames', help='The input'
                        ' FAST[AQ] sequence file(s).', nargs='+')

    parser.add_argument('-o', '--out', metavar="output_file",
                        dest='output_file',
                        type=argparse.FileType('w'),
                        default=None, help='output counts to this file')

    return parser


def main():
    info('count-kmers.py', ['counting'])
    args = get_parser().parse_args()

    print('hashtable from', args.input_count_graph_filename,
          file=sys.stderr)
    countgraph = load_countgraph(args.input_count_graph_filename)

    kmer_size = countgraph.ksize()

    if args.output_file is None:
        args.output_file = sys.stdout
    writer = csv.writer(args.output_file)

    seen = set()
    for filename in args.input_sequence_filenames:
        for record in iter_records(filename):
            seq = record.sequence.replace('N', 'A')
            if len(seq) < kmer_size:
                continue
            hashes = countgraph._hashes_for_sequence(seq)
            counts = countgraph.get_counts_for_hashes(hashes)
            for i, (h, c) in enumerate(zip(hashes.tolist(),
                                           counts.tolist())):
                if h not in seen:
                    seen.add(h)
                    writer.writerow([seq[i:i + kmer_size], str(c)])

    print('Total number of unique k-mers: {0}'.format(
        countgraph.n_unique_kmers()), file=sys.stderr)


if __name__ == '__main__':
    main()
