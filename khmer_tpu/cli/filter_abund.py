#!/usr/bin/env python
"""Trim sequences at a minimum k-mer abundance using a saved countgraph.

Mirrors the reference scripts/filter-abund.py; the per-read count
lookups are batched on device.

% filter-abund.py <counting.ct> <data1> [ <data2> <...> ]
"""

import os
import sys
import textwrap

from khmer_tpu import load_countgraph
from khmer_tpu.cli.args import (FileType as khFileType,
                                KhmerArgumentParser, add_threading_args,
                                check_argument_range, sanitize_help)
from khmer_tpu.core import pipeline
from khmer_tpu.io.fastx import ReadParser, write_record
from khmer_tpu.io.pairing import broken_paired_reader
from khmer_tpu.utils.kfile import (add_output_compression_type,
                                   check_input_files, check_space,
                                   get_file_writer)
from khmer_tpu.utils.logger import configure_logging, log_error, log_info
from khmer_tpu.utils.trimming import (_apply_trim,
                                      median_at_least_from_counts,
                                      trim_pos_from_counts)

DEFAULT_NORMALIZE_LIMIT = 20
DEFAULT_CUTOFF = 2


def get_parser():
    epilog = """\
    Trimmed sequences will be placed in
    ``${input_sequence_filename}.abundfilt`` for each input sequence file.
    If the input sequences are from RNAseq or metagenome sequencing then
    :option:`--variable-coverage` should be used.

    Example::

        load-into-counting.py -k 20 -x 5e7 countgraph data/100k-filtered.fa
        filter-abund.py -C 2 countgraph data/100k-filtered.fa
    """
    parser = KhmerArgumentParser(
        description='Trim sequences at a minimum k-mer abundance.',
        epilog=textwrap.dedent(epilog),
        citations=['counting'])
    parser.add_argument('input_graph',
                        metavar='input_count_graph_filename',
                        help='The input k-mer countgraph filename')
    parser.add_argument('input_filename',
                        metavar='input_sequence_filename',
                        help='Input FAST[AQ] sequence filename', nargs='+')
    add_threading_args(parser)
    parser.add_argument('-C', '--cutoff', dest='cutoff',
                        default=DEFAULT_CUTOFF,
                        type=check_argument_range(0, 256, 'cutoff'),
                        help="Trim at k-mers below this abundance.")
    parser.add_argument('-V', '--variable-coverage', action='store_true',
                        dest='variable_coverage', default=False,
                        help='Only trim low-abundance k-mers from '
                        'sequences that have high coverage.')
    parser.add_argument('-Z', '--normalize-to', type=int,
                        dest='normalize_to',
                        help='Base the variable-coverage cutoff on this '
                        'median k-mer abundance.',
                        default=DEFAULT_NORMALIZE_LIMIT)
    parser.add_argument('-o', '--output', dest='single_output_file',
                        type=khFileType('wb'),
                        metavar="optional_output_filename",
                        help='Output the trimmed sequences into a single '
                        'file with the given filename instead of creating '
                        'a new file for each input file.')
    parser.add_argument('-f', '--force', default=False,
                        action='store_true',
                        help='Overwrite output file if it exists')
    parser.add_argument('-q', '--quiet', dest='quiet', default=False,
                        action='store_true')
    add_output_compression_type(parser)
    return parser


def main():
    args = sanitize_help(get_parser()).parse_args()

    configure_logging(args.quiet)

    infiles = args.input_filename
    if ('-' in infiles or '/dev/stdin' in infiles) and not \
       args.single_output_file:
        log_error("Accepting input from stdin; output filename must "
                  "be provided with -o.")
        sys.exit(1)

    for filename in infiles:
        check_input_files(filename, args.force)

    check_space(infiles, args.force)

    log_info('loading countgraph: {graph}', graph=args.input_graph)
    countgraph = load_countgraph(args.input_graph)
    ksize = countgraph.ksize()

    log_info("K: {ksize}", ksize=ksize)

    if args.single_output_file:
        outfile = args.single_output_file.name
        outfp = get_file_writer(args.single_output_file, args.gzip,
                                args.bzip)

    for infile in infiles:
        log_info('filtering {infile}', infile=infile)
        if not args.single_output_file:
            outfile = os.path.basename(infile) + '.abundfilt'
            outfp = open(outfile, 'wb')
            outfp = get_file_writer(outfp, args.gzip, args.bzip)

        paired_iter = broken_paired_reader(ReadParser(infile),
                                           min_length=ksize,
                                           force_single=True)
        records = (read1 for _, _, read1, _ in paired_iter)

        from khmer_tpu.core import hostengine

        if hostengine.use_host_for(countgraph, "trim") and \
                args.cutoff <= 255 and (not args.variable_coverage
                                        or args.normalize_to <= 255):
            # host tier: one native call per window computes the
            # variable-coverage gate + trim position for every read
            window = []
            while True:
                window = [r for _, r in zip(range(16384), records)]
                if not window:
                    break
                codes, starts, ends, _ = hostengine.pack_records(window)
                trims = hostengine.trim_filter(
                    countgraph, codes, starts, ends, args.cutoff,
                    args.variable_coverage, args.normalize_to)
                for record, ta in zip(window, trims):
                    trimmed_record, _ = _apply_trim(ksize, record,
                                                    max(int(ta), 0))
                    if trimmed_record:
                        write_record(trimmed_record, outfp)
            log_info('output in {outfile}', outfile=outfile)
            continue

        for record, counts in pipeline.counts_for_records(countgraph,
                                                          records):
            seqN = record.cleaned_seq
            if args.variable_coverage and not median_at_least_from_counts(
                    counts, ksize, args.normalize_to, len(seqN)):
                write_record(record, outfp)
                continue
            trim_at = trim_pos_from_counts(counts, ksize, args.cutoff,
                                           len(seqN))
            trimmed_record, _ = _apply_trim(ksize, record, trim_at)
            if trimmed_record:
                write_record(trimmed_record, outfp)

        log_info('output in {outfile}', outfile=outfile)


if __name__ == '__main__':
    main()
