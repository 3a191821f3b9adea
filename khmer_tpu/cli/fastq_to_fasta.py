#!/usr/bin/env python
"""Convert FASTQ files to FASTA format.

Mirrors the reference scripts/fastq-to-fasta.py.

% fastq-to-fasta.py [ -n -o ] <fastq_name>
"""

import sys

from khmer_tpu.cli.args import (FileType as khFileType,
                                KhmerArgumentParser, sanitize_help)
from khmer_tpu.io.fastx import FastxParser, write_record
from khmer_tpu.utils.kfile import (add_output_compression_type,
                                   describe_file_handle, get_file_writer)


def get_parser():
    parser = KhmerArgumentParser(
        description='Converts FASTQ format (.fq) files to FASTA format '
        '(.fa).')

    parser.add_argument('input_sequence', help='The name of the input'
                        ' FASTQ sequence file.')
    parser.add_argument('-o', '--output', metavar="filename",
                        help='The name of the output'
                        ' FASTA sequence file.',
                        type=khFileType('wb'),
                        default=sys.stdout.buffer
                        if hasattr(sys.stdout, "buffer") else sys.stdout)
    parser.add_argument('-n', '--n_keep', default=False,
                        action='store_true',
                        help='Option to keep reads containing \'N\'s in '
                        'input_sequence file. Default is to drop reads')
    add_output_compression_type(parser)
    return parser


def main():
    args = sanitize_help(get_parser()).parse_args()

    print('fastq from ', args.input_sequence, file=sys.stderr)
    outfp = get_file_writer(args.output, args.gzip, args.bzip)
    n_count = 0
    for n, record in enumerate(FastxParser(args.input_sequence)):
        if n % 10000 == 0:
            print('...', n, file=sys.stderr)

        sequence = record.sequence

        if 'N' in sequence:
            if not args.n_keep:
                n_count += 1
                continue

        record.quality = None
        write_record(record, outfp)

    print('\n' + 'lines from ' + args.input_sequence, file=sys.stderr)

    if not args.n_keep:
        print(str(n_count) + ' lines dropped.', file=sys.stderr)
    else:
        print('No lines dropped from file.', file=sys.stderr)

    print('Wrote output to', describe_file_handle(args.output),
          file=sys.stderr)


if __name__ == '__main__':
    main()
