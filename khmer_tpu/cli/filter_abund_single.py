#!/usr/bin/env python
"""Trim sequences at a minimum k-mer abundance, counting in-process.

Mirrors the reference scripts/filter-abund-single.py.

% filter-abund-single.py <data>
"""

import os
import textwrap

from khmer_tpu import calc_expected_collisions
from khmer_tpu.cli import args as khmer_args
from khmer_tpu.cli.args import (add_threading_args, build_counting_args,
                                calculate_graphsize, check_argument_range,
                                report_on_config, sanitize_help)
from khmer_tpu.core import pipeline
from khmer_tpu.io.fastx import ReadParser, write_record
from khmer_tpu.io.pairing import broken_paired_reader
from khmer_tpu.utils.kfile import (add_output_compression_type,
                                   check_input_files, check_space,
                                   check_space_for_graph, get_file_writer)
from khmer_tpu.utils.logger import configure_logging, log_info
from khmer_tpu.utils.trimming import (_apply_trim,
                                      median_at_least_from_counts,
                                      trim_pos_from_counts)

DEFAULT_NORMALIZE_LIMIT = 20
DEFAULT_CUTOFF = 2


def get_parser():
    epilog = """\
    Trimmed sequences will be placed in ``${input_sequence_filename}
    .abundfilt``.

    This script is constant memory.

    To trim reads based on k-mer abundance across multiple files, use
    :program:`load-into-counting.py` and :program:`filter-abund.py`.

    Example::

        filter-abund-single.py -k 20 -x 5e7 -C 2 data/100k-filtered.fa
    """
    parser = build_counting_args(
        descr="Trims sequences at a minimum k-mer abundance "
        "(in memory version).", epilog=textwrap.dedent(epilog),
        citations=['counting'])
    add_threading_args(parser)

    parser.add_argument('--cutoff', '-C', default=DEFAULT_CUTOFF,
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
    parser.add_argument('--savegraph', metavar="filename", default='',
                        help="If present, the name of the file to save "
                        "the k-mer countgraph to")
    parser.add_argument('-o', '--outfile',
                        metavar='optional_output_filename',
                        default=None, help='Override default output '
                        'filename and output trimmed sequences into a '
                        'file with the given filename.')
    parser.add_argument('datafile', metavar='input_sequence_filename',
                        help="FAST[AQ] sequence file to trim")
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
    check_input_files(args.datafile, args.force)
    check_space([args.datafile], args.force)

    if args.savegraph:
        tablesize = calculate_graphsize(args, 'countgraph')
        check_space_for_graph(args.savegraph, tablesize, args.force)

    report_on_config(args)

    log_info('making countgraph')
    graph = khmer_args.create_countgraph(args)

    log_info('consuming input, round 1 -- {datafile}',
             datafile=args.datafile)
    graph.consume_seqfile(args.datafile)

    log_info('Total number of unique k-mers: {nk}',
             nk=graph.n_unique_kmers())

    fp_rate = calc_expected_collisions(graph, args.force)
    log_info('fp rate estimated to be {fpr:1.3f}', fpr=fp_rate)

    log_info('filtering {datafile}', datafile=args.datafile)
    if args.outfile is None:
        outfile = os.path.basename(args.datafile) + '.abundfilt'
    else:
        outfile = args.outfile
    outfp = open(outfile, 'wb')
    outfp = get_file_writer(outfp, args.gzip, args.bzip)

    paired_iter = broken_paired_reader(ReadParser(args.datafile),
                                       min_length=graph.ksize(),
                                       force_single=True)
    records = (read1 for _, _, read1, _ in paired_iter)
    ksize = graph.ksize()
    for record, counts in pipeline.counts_for_records(graph, records):
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

    if args.savegraph:
        log_info('Saving k-mer countgraph filename {graph}',
                 graph=args.savegraph)
        graph.save(args.savegraph)


if __name__ == '__main__':
    main()
