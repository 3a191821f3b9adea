#!/usr/bin/env python
"""Collect reads into a countgraph until average coverage reaches -C.

Sandbox-tier equivalent of reference sandbox/collect-reads.py:44-175,
rebuilt on this framework's batched engines: reads stream through
device-batched median estimation (`counts_for_records`) and the
flat-stream consume pipeline instead of the reference's per-read
`get_median_count`/`consume` Python loop. Medians inside a window are
measured against the tables as of the window start (counts only grow,
so the stop triggers within one window of the sequential cut point).

% python sandbox/collect-reads.py <htname> <data1> [ <data2> <...> ]

Use '-h' for parameter help.
"""

import argparse
import sys
import textwrap

from _sandbox import iter_records

import khmer_tpu
from khmer_tpu.cli import args as khmer_args
from khmer_tpu.cli.args import (build_counting_args, calculate_graphsize,
                                info, report_on_config, sanitize_help)
from khmer_tpu.core.pipeline import counts_for_records
from khmer_tpu.utils.kfile import (check_input_files, check_space,
                                   check_space_for_graph)

WINDOW = 1000  # reads per device batch


def get_parser():
    epilog = """
    Builds the countgraph in device-batched windows and stops once the
    running average read coverage (median k-mer count) exceeds -C.
    With -b the memory usage is about 1.15x the product of -x and -N.

    Example::

        collect-reads.py -k 20 -x 5e7 out.ct data/100k-filtered.fa
    """
    parser = build_counting_args("Collect reads until a given avg coverage.",
                                 epilog=textwrap.dedent(epilog))
    parser.add_argument('output_countgraph_filename', help="The name of the"
                        " file to write the k-mer countgraph to.")
    parser.add_argument('input_sequence_filename', nargs='+',
                        help="The names of one or more FAST[AQ] input "
                        "sequence files.")
    parser.add_argument('--report-total-kmers', '-t', action='store_true',
                        help="Prints the total number of k-mers to stderr")
    parser.add_argument('-C', '--coverage', type=int, default=50,
                        help='Collect reads until this coverage, then exit.')
    parser.add_argument('-o', '--output', type=argparse.FileType('w'),
                        help='Write collect reads into this file.')
    parser.add_argument('-b', '--no-bigcount', dest='bigcount', default=True,
                        action='store_false',
                        help='Do not count k-mers past 255')
    return parser


def _emit(fp, read):
    if getattr(read, 'quality', None):
        fp.write("@%s\n%s\n+\n%s\n" % (read.name, read.sequence,
                                       read.quality))
    else:
        fp.write(">%s\n%s\n" % (read.name, read.sequence))


def _median(counts):
    if counts.size == 0:
        return None
    return int(sorted(counts)[len(counts) // 2])


def _windows(filenames, size):
    """Yield (filename, file_index, [records]) windows across files.

    Window sizes ramp geometrically from 50 up to `size`, so on deep
    data the coverage monitor (which sees tables as of window start)
    reacts within a small window while shallow streams still batch
    large.
    """
    take = 50
    for index, filename in enumerate(filenames):
        batch = []
        for record in iter_records(filename):
            batch.append(record)
            if len(batch) >= take:
                yield filename, index, batch
                batch = []
                take = min(take * 2, size)
        if batch:
            yield filename, index, batch
            take = min(take * 2, size)


def collect(htable, filenames, target_coverage, output_fp=None,
            window=WINDOW):
    """Stream reads through windowed median checks + batched consume.

    Returns (n_reads_collected, final_average_coverage).
    """
    coverage_sum = 0.0
    n_reads = 0
    done = False
    for filename, index, batch in _windows(filenames, window):
        # medians for the whole window against the window-start tables
        meds = [_median(c)
                for _, c in counts_for_records(htable, batch)]
        # find the sequential stop point inside the window
        take = len(batch)
        for i, med in enumerate(meds):
            if med is None:
                continue
            coverage_sum += med
            n_reads += 1
            if coverage_sum / n_reads > target_coverage:
                print('reached target average coverage:',
                      coverage_sum / n_reads)
                take = i  # the triggering read is NOT collected
                done = True
                break
        kept = [r for r in batch[:take]
                if len(r.cleaned_seq) >= htable.ksize()]
        if kept:
            htable.consume_seqfile(iter(kept))
            if output_fp:
                for r in kept:
                    _emit(output_fp, r)
        if n_reads and n_reads % window == 0:
            print('...', index, filename, n_reads,
                  coverage_sum / n_reads)
        if done:
            break
    avg = coverage_sum / n_reads if n_reads else 0.0
    return n_reads, avg


def main():
    info('collect-reads.py', ['counting'])
    args = sanitize_help(get_parser()).parse_args()
    report_on_config(args)

    base = args.output_countgraph_filename
    filenames = args.input_sequence_filename
    for name in filenames:
        check_input_files(name, False)
    check_space(filenames, False)
    tablesize = calculate_graphsize(args, 'countgraph')
    check_space_for_graph(base, tablesize, False)

    print('Saving k-mer countgraph to %s' % base)
    print('Loading sequences from %s' % repr(filenames))
    if args.output:
        print('Outputting sequences to', args.output)

    print('making countgraph', file=sys.stderr)
    htable = khmer_args.create_countgraph(args)
    htable.set_use_bigcount(args.bigcount)

    n, _avg = collect(htable, filenames, args.coverage, args.output)
    print('Collected %d reads' % (n,))

    if args.report_total_kmers:
        print('Total number of k-mers: {0}'.format(
            htable.n_occupied()), file=sys.stderr)

    print('saving', base)
    htable.save(base)

    with open(base + '.info', 'w') as info_fp:
        info_fp.write('through end: %s\n' % filenames[-1])
        fp_rate = khmer_tpu.calc_expected_collisions(htable, False,
                                                     max_false_pos=.2)
        print('fp rate estimated to be %1.3f' % fp_rate)
        info_fp.write('fp rate estimated to be %1.3f\n' % fp_rate)

    print('DONE.')


if __name__ == '__main__':
    main()
