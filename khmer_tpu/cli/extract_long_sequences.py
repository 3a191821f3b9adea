#!/usr/bin/env python
"""Extract FASTQ or FASTA sequences longer than the given length.

Mirrors the reference scripts/extract-long-sequences.py.

% extract-long-sequences.py [ -l <length> ] <files>
"""

import sys

from khmer_tpu.cli.args import (FileType as khFileType,
                                KhmerArgumentParser, sanitize_help)
from khmer_tpu.io.fastx import FastxParser, write_record
from khmer_tpu.utils.kfile import (add_output_compression_type,
                                   get_file_writer)


def get_parser():
    parser = KhmerArgumentParser(
        description='Extract FASTQ or FASTA sequences longer than'
        ' specified length (default: 200 bp).')
    parser.add_argument('input_filenames', help='Input FAST[AQ]'
                        ' sequence filename.', nargs='+')
    parser.add_argument('-o', '--output', help='The name of the output'
                        ' sequence file.', default=sys.stdout.buffer
                        if hasattr(sys.stdout, "buffer") else sys.stdout,
                        metavar='output', type=khFileType('wb'))
    parser.add_argument('-l', '--length', help='The minimum length of'
                        ' the sequence file.',
                        type=int, default=200)
    add_output_compression_type(parser)
    return parser


def main():
    args = sanitize_help(get_parser()).parse_args()
    outfp = get_file_writer(args.output, args.gzip, args.bzip)
    for filename in args.input_filenames:
        for record in FastxParser(filename):
            if len(record.sequence) >= args.length:
                write_record(record, outfp)
    print('wrote to: ' + args.output.name, file=sys.stderr)


if __name__ == '__main__':
    main()
