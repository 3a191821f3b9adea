#!/usr/bin/env python
"""
Error correct reads based on a counting table from a diginorm step.
Output sequences will be put in inputfile.corr.

Sandbox-tier equivalent of reference sandbox/error-correct-pass2.py:44-123.

% python sandbox/error-correct-pass2.py <counting.ct> <readfile>

Use '-h' for parameter help.
"""

import os
import sys

from _sandbox import iter_records

from khmer_tpu import ReadAligner, load_countgraph
from khmer_tpu.cli import args as khmer_args
from khmer_tpu.cli.args import FileType as khFileType

DEFAULT_CUTOFF = 2


def output_single(read, new_sequence):
    name = read.name
    sequence = new_sequence

    quality = None
    if getattr(read, 'quality', None):
        quality = read.quality[:len(sequence)]
        sequence = sequence[:len(quality)]  # sequence is _lengthened_

    if quality:
        assert len(sequence) == len(quality), (sequence, quality)
        return "@%s\n%s\n+\n%s\n" % (name, sequence, quality)
    return ">%s\n%s\n" % (name, sequence)


def main():
    parser = khmer_args.build_counting_args(
        "Correct reads against an already-computed table",
        citations=['counting', 'SeqAn'])

    parser.add_argument("--trusted-cov", dest="trusted_cov", type=int,
                        default=DEFAULT_CUTOFF)
    parser.add_argument("--theta", dest="bits_theta", type=float,
                        default=1.0)
    parser.add_argument('-o', '--output', dest='output_file',
                        help="output file for corrected reads; defaults to "
                             "<first filename>.corr in cwd.",
                        type=khFileType('w'), default=None)

    parser.add_argument('counts_table')
    parser.add_argument('readfile')

    args = parser.parse_args()

    print('loading counts')
    ht = load_countgraph(args.counts_table)

    aligner = ReadAligner(ht, args.trusted_cov, args.bits_theta)

    print("trusted:", args.trusted_cov)

    corrfp = args.output_file
    if not corrfp:
        outfile = os.path.basename(args.readfile) + '.corr'
        corrfp = open(outfile, 'w')

    n_corrected = 0
    for n, read in enumerate(iter_records(args.readfile)):
        if n % 10000 == 0:
            print('...', n, n_corrected, file=sys.stderr)
        seq = read.sequence.replace('N', 'A')

        # build the alignment...
        score, graph_alignment, read_alignment, truncated = \
            aligner.align(seq)

        if not truncated:
            graph_seq = graph_alignment.replace("-", "")
            if graph_seq != seq:
                n_corrected += 1

            seq = graph_seq

        corrfp.write(output_single(read, seq))


if __name__ == '__main__':
    main()
