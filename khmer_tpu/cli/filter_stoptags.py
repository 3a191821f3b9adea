#!/usr/bin/env python
"""Trim sequences at stoptags.

Mirrors the reference scripts/filter-stoptags.py.

% filter-stoptags.py <stoptags> <data1> [ <data2> <...> ]
"""

import os
import sys
import textwrap

from khmer_tpu import Nodegraph
from khmer_tpu.cli.args import (DEFAULT_K, KhmerArgumentParser,
                                sanitize_help)
from khmer_tpu.io.fastx import FastxParser
from khmer_tpu.utils.kfile import check_input_files, check_space


def get_parser():
    epilog = """\
    Load stoptags in from the given `.stoptags` file and use them to
    trim or remove the sequences in <file1-N>.  Trimmed sequences will
    be placed in ``<fileN>.stopfilt``.
    """
    parser = KhmerArgumentParser(
        description="Trim sequences at stoptags.",
        epilog=textwrap.dedent(epilog), citations=['graph'])
    parser.add_argument('--ksize', '-k', default=DEFAULT_K, type=int,
                        help='k-mer size')
    parser.add_argument('stoptags_file', metavar='input_stoptags_filename')
    parser.add_argument('input_filenames',
                        metavar='input_sequence_filename', nargs='+')
    parser.add_argument('-f', '--force', default=False,
                        action='store_true',
                        help='Overwrite output file if it exists')
    return parser


def main():
    args = sanitize_help(get_parser()).parse_args()
    stoptags = args.stoptags_file
    infiles = args.input_filenames

    for _ in infiles:
        check_input_files(_, args.force)

    check_space(infiles, args.force)

    print('loading stop tags, with K', args.ksize, file=sys.stderr)
    nodegraph = Nodegraph(args.ksize, 1, 1)
    nodegraph.load_stop_tags(stoptags)

    def process_fn(record):
        name = record.name
        seq = record.sequence
        if 'N' in seq:
            return None, None
        trim_seq, trim_at = nodegraph.trim_on_stoptags(seq)
        if trim_at >= args.ksize:
            return name, trim_seq
        return None, None

    # the filtering loop
    for infile in infiles:
        print('filtering', infile, file=sys.stderr)
        outfile = os.path.basename(infile) + '.stopfilt'

        outfp = open(outfile, 'w')
        for record in FastxParser(infile):
            name, seq = process_fn(record)
            if name and seq:
                outfp.write('>%s\n%s\n' % (name, seq))
        outfp.close()

        print('output in', outfile, file=sys.stderr)


if __name__ == '__main__':
    main()
