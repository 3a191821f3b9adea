#!/usr/bin/env python
"""Count the median/avg k-mer abundance for each sequence.

Mirrors the reference scripts/count-median.py. The per-sequence count
gathers run batched on device; bigcount fixups apply on host.

% count-median.py <htname> <input> <output>
"""

import csv
import sys
import textwrap

import numpy as np

from khmer_tpu import load_countgraph
from khmer_tpu.cli.args import (FileType as khFileType,
                                KhmerArgumentParser, sanitize_help)
from khmer_tpu.core import pipeline
from khmer_tpu.io.fastx import FastxParser, clean_dna_script
from khmer_tpu.utils.kfile import check_input_files, check_space


def get_parser():
    epilog = """\
    Count the median/avg k-mer abundance for each sequence in the input
    file, based on the k-mer counts in the given k-mer countgraph.  Can be
    used to estimate expression levels (mRNAseq) or coverage
    (genomic/metagenomic).

    The output file contains sequence id, median, average, stddev, and
    seq length, in comma-separated value (CSV) format.

    Example::

        load-into-counting.py counts tests/test-data/test-reads.fq.gz
        count-median.py counts tests/test-data/test-reads.fq.gz medians.txt

    NOTE: All 'N's in the input sequences are converted to 'A's.
    """
    parser = KhmerArgumentParser(
        description='Count k-mers summary stats for sequences',
        epilog=textwrap.dedent(epilog), citations=['counting'])

    parser.add_argument('countgraph', metavar='input_count_graph_filename',
                        help='input k-mer countgraph filename')
    parser.add_argument('input', metavar='input_sequence_filename',
                        help='input FAST[AQ] sequence filename')
    parser.add_argument('output', metavar='output_summary_filename',
                        help='output summary filename',
                        type=khFileType('w'))
    parser.add_argument('-f', '--force', default=False,
                        action='store_true',
                        help='Overwrite output file if it exists')
    return parser


def main():
    args = sanitize_help(get_parser()).parse_args()

    htfile = args.countgraph
    input_filename = args.input
    output = args.output

    infiles = [htfile, input_filename]
    for infile in infiles:
        check_input_files(infile, args.force)

    check_space(infiles, args.force)

    print('loading k-mer countgraph from', htfile, file=sys.stderr)
    countgraph = load_countgraph(htfile)
    ksize = countgraph.ksize()
    print('writing to', output.name, file=sys.stderr)

    output = csv.writer(output)
    output.writerow(['name', 'median', 'average', 'stddev', 'seqlen'])

    def cleaned_records():
        for record in FastxParser(input_filename):
            # script semantics: upper + N->A only (khmer/utils.py style)
            record.cleaned_seq = clean_dna_script(record.sequence)
            if ksize <= len(record.cleaned_seq):
                yield record

    from khmer_tpu.core import hostengine
    from khmer_tpu.core.sketch import _median_avg_stddev

    if hostengine.use_host_for(countgraph, "trim") and \
            not countgraph._bigcounts:
        # host tier: one native median/avg/stddev call per window
        for window in _windows(cleaned_records(), 16384):
            codes, starts, ends, _ = hostengine.pack_records(window)
            med, avg, std = hostengine.median_counts(
                countgraph, codes, starts, ends)
            for i, record in enumerate(window):
                output.writerow([
                    record.name, int(med[i]),
                    round(float(avg[i]), 9), round(float(std[i]), 9),
                    len(record.sequence)])
        return

    for record, counts in pipeline.counts_for_records(countgraph,
                                                      cleaned_records()):
        medn, ave, stdev = _median_avg_stddev(counts)
        ave, stdev = [round(x, 9) for x in (ave, stdev)]
        output.writerow([record.name, medn, ave, stdev,
                         len(record.sequence)])


def _windows(records, size):
    batch = []
    for rec in records:
        batch.append(rec)
        if len(batch) >= size:
            yield batch
            batch = []
    if batch:
        yield batch


if __name__ == '__main__':
    main()
