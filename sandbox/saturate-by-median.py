#!/usr/bin/env python
"""Measure a saturation curve: how many incoming reads still look novel.

Every read (or read pair) is consumed into the countgraph; a read
counts as "kept" when its median k-mer count is still below -C
(default 1, i.e. it brought unseen k-mers). The kept-vs-total curve
written to -R is the saturation measurement. Behavioral contract of
reference sandbox/saturate-by-median.py:38-283, rebuilt on this
framework's batched engines: medians come from device-batched
`counts_for_records` per window (measured against the window-start
tables; counts only grow, so "kept" is an upper bound within one
window) and consumption goes through the flat-stream pipeline.
"""

import argparse
import sys
import textwrap

from _sandbox import iter_records

import khmer_tpu
from khmer_tpu import load_countgraph
from khmer_tpu.cli.args import (add_loadgraph_args, build_counting_args,
                                create_countgraph, info, report_on_config,
                                sanitize_help)
from khmer_tpu.core.pipeline import counts_for_records
from khmer_tpu.utils.kfile import (check_space, check_space_for_graph,
                                   check_valid_file_exists)

DEFAULT_DESIRED_COVERAGE = 1
WINDOW_BUNDLES = 500


def _interleaved_bundles(records, paired):
    """Yield read bundles: pairs when --paired (validated), else
    singletons."""
    if not paired:
        for record in records:
            yield (record,)
        return
    it = iter(records)
    for left in it:
        right = next(it, None)
        if right is None:
            return
        ok = (left.name[-1] == "1" and right.name[-1] == "2"
              and left.name[:-1] == right.name[:-1])
        if not ok:
            raise IOError('Error: Improperly interleaved pairs \
                {b0} {b1}'.format(b0=left.name, b1=right.name))
        yield (left, right)


def _bundle_windows(records, paired, size):
    window = []
    for bundle in _interleaved_bundles(records, paired):
        window.append(bundle)
        if len(window) >= size:
            yield window
            window = []
    if window:
        yield window


class SaturationMonitor:
    """Windowed saturation scan over one stream.

    For each window: batched medians against the window-start tables
    decide kept/discarded per bundle, then the whole window is
    consumed. Tracks the running curve and emits report lines.
    """

    def __init__(self, htable, cutoff, report_fp=None,
                 report_frequency=100000):
        self.htable = htable
        self.cutoff = cutoff
        self.report_fp = report_fp
        self.report_frequency = report_frequency
        self.total = 0
        self.discarded = 0
        self._next_report = report_frequency

    def _median_by_read(self, reads):
        meds = {}
        for rec, counts in counts_for_records(self.htable, reads):
            meds[id(rec)] = (int(sorted(counts)[len(counts) // 2])
                             if counts.size else None)
        return meds

    def scan_file(self, input_filename, paired):
        k = self.htable.ksize()
        file_total = 0
        file_discarded = 0
        for window in _bundle_windows(iter_records(input_filename), paired,
                                      WINDOW_BUNDLES):
            flat = [r for b in window for r in b]
            meds = self._median_by_read(flat)
            for bundle in window:
                file_total += len(bundle)
                fresh = any(meds[id(r)] is not None
                            and meds[id(r)] < self.cutoff for r in bundle)
                whole = all(len(r.sequence) >= k for r in bundle)
                if not (fresh and whole):
                    file_discarded += len(bundle)
                self._maybe_report(input_filename, file_total,
                                   file_discarded)
            keep = [r for r in flat if len(r.cleaned_seq) >= k]
            if keep:
                self.htable.consume_seqfile(iter(keep))
        self.total += file_total
        self.discarded += file_discarded
        return file_total, file_discarded

    def _maybe_report(self, filename, total, discarded):
        if total < self._next_report:
            return
        self._next_report += self.report_frequency
        kept = total - discarded
        print('... kept {kept} of {total} or {perc:2}%'.format(
            kept=kept, total=total,
            perc=int(100. - discarded / float(total) * 100.)))
        print('... in file', filename)
        if self.report_fp:
            print(total, kept, 1. - (discarded / float(total)),
                  file=self.report_fp)
            self.report_fp.flush()


def get_parser():
    epilog = """
    Writes the saturation curve (total, kept, kept-fraction) to the -R
    report file as the stream is consumed. Flag semantics follow
    normalize-by-median.py.
    """
    parser = build_counting_args(
        descr="Measure read saturation against a streaming countgraph",
        epilog=textwrap.dedent(epilog))
    parser.add_argument('-C', '--cutoff', type=int,
                        default=DEFAULT_DESIRED_COVERAGE)
    parser.add_argument('-p', '--paired', action='store_true')
    parser.add_argument('-s', '--savegraph', metavar="filename", default='')
    parser.add_argument('-R', '--report',
                        metavar='filename', type=argparse.FileType('w'))
    parser.add_argument('--report-frequency',
                        metavar='report_frequency', default=100000,
                        type=int)
    parser.add_argument('-f', '--fault-tolerant', dest='force',
                        help='continue on next file if read errors are \
                         encountered', action='store_true')
    parser.add_argument('-o', '--out', metavar="filename",
                        dest='single_output_filename',
                        default='', help='only output a single'
                        ' file with the specified filename')
    parser.add_argument('input_filenames', metavar='input_sequence_filename',
                        help='Input FAST[AQ] sequence filename.', nargs='+')
    add_loadgraph_args(parser)
    return parser


def main():
    info('saturate-by-median.py', ['diginorm'])
    args = sanitize_help(get_parser()).parse_args()
    report_on_config(args)

    check_valid_file_exists(args.input_filenames)
    check_space(args.input_filenames, False)
    if args.savegraph:
        check_space_for_graph(args.savegraph, 'countgraph', False)

    if args.loadgraph:
        print('loading k-mer countgraph from', args.loadgraph)
        htable = load_countgraph(args.loadgraph)
    else:
        print('making countgraph')
        htable = create_countgraph(args)

    monitor = SaturationMonitor(htable, args.cutoff, args.report,
                                args.report_frequency)
    corrupt_files = []
    last_file = None
    for last_file in args.input_filenames:
        try:
            file_total, file_discarded = monitor.scan_file(last_file,
                                                           args.paired)
        except IOError as err:
            print('** ERROR:', err, file=sys.stderr)
            print('** Failed on {name}: '.format(name=last_file),
                  file=sys.stderr)
            if not args.force:
                print("NOTE: This can be overridden using the --force"
                      " argument", file=sys.stderr)
                print('** Exiting!', file=sys.stderr)
                sys.exit(1)
            print('*** Skipping error file, moving on...', file=sys.stderr)
            corrupt_files.append(last_file)
            continue
        if file_total == 0 and file_discarded == 0:
            print('SKIPPED empty file', last_file)
        else:
            kept = monitor.total - monitor.discarded
            print('DONE with {inp}; kept {kept} of {total} or {perc:2}%'
                  .format(inp=last_file, kept=kept, total=monitor.total,
                          perc=int(100. - monitor.discarded /
                                   float(monitor.total) * 100.)))

    if args.savegraph:
        print('Saving k-mer countgraph through', last_file)
        print('...saving to', args.savegraph)
        htable.save(args.savegraph)

    # re: threshold, see Zhang et al., http://arxiv.org/abs/1309.2975
    fp_rate = khmer_tpu.calc_expected_collisions(htable, args.force,
                                                 max_false_pos=.8)
    print('fp rate estimated to be {fpr:1.3f}'.format(fpr=fp_rate))

    if args.force and corrupt_files:
        print("** WARNING: Finished with errors!", file=sys.stderr)
        print("** I/O Errors occurred in the following files:",
              file=sys.stderr)
        print("\t", " ".join(corrupt_files), file=sys.stderr)


if __name__ == '__main__':
    main()
