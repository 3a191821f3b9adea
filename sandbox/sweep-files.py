#!/usr/bin/env python
"""Sweep query reads into one output per database file, by graph
connectivity.

Sandbox-tier equivalent of reference sandbox/sweep-files.py:130-229:
label the de Bruijn graph with one label per database file, then route
each query read to the outputs of every database it connects to
(within --traversal_range), using small write-behind queues.

% sweep-files.py -r <range> --db <fasta/q> ... --query <fasta/q> ...
"""

import os
import sys
from collections import deque

from _sandbox import iter_records  # noqa: F401

from khmer_tpu import GraphLabels
from khmer_tpu.cli.args import (build_nodegraph_args, create_nodegraph,
                                report_on_config, sanitize_help)
from khmer_tpu.io.fastx import write_record

DEFAULT_OUT_PREF = 'reads'
DEFAULT_RANGE = -1

MIN_HSIZE = 4e7
MIN_KSIZE = 21


class IODeque(deque):
    """Deque that flushes its records to a file at a size limit
    (reference sandbox/sweep-files.py:110-126)."""

    def __init__(self, limit, outfp):
        deque.__init__(self)
        self.outfp = outfp
        self.limit = limit

    def append(self, x):
        deque.append(self, x)
        if len(self) >= self.limit:
            self.clear()

    def clear(self):
        while len(self):
            write_record(self.popleft(), self.outfp)
        deque.clear(self)


def get_parser():
    parser = build_nodegraph_args(
        'Takes a list of database files and a list of query reads, and '
        'sorts the reads by which database they connect to')
    parser.add_argument('-r', '--traversal_range', type=int,
                        dest='traversal_range', default=DEFAULT_RANGE,
                        help='depth of breadth-first search from each read')
    parser.add_argument('--max_queue_size', type=int, default=1000)
    parser.add_argument('--prefix', dest='output_prefix',
                        default=DEFAULT_OUT_PREF,
                        help='Prefix for sorted read files')
    parser.add_argument('--outdir', dest='outdir', default='',
                        help='output directory')
    parser.add_argument('--query', dest='query', nargs='+',
                        help='Reads to be swept and sorted')
    parser.add_argument('--db', dest='db', nargs='+', required=True,
                        help='Database reads for sweep')
    return parser


def main():
    parser = sanitize_help(get_parser())
    args = parser.parse_args()

    if args.max_tablesize < MIN_HSIZE:
        args.max_tablesize = MIN_HSIZE
    if args.ksize < MIN_KSIZE:
        args.ksize = MIN_KSIZE

    report_on_config(args, graphtype='nodegraph')

    traversal_range = args.traversal_range
    if traversal_range < 0:
        # the reference passes -1 into a C unsigned int (labeling.pyx
        # <unsigned int>radius), i.e. an effectively unbounded sweep
        traversal_range = 2**32 - 1

    outputs = {}

    graph = create_nodegraph(args)
    lh = GraphLabels(graph)
    print('consuming and labeling input sequences...', file=sys.stderr)
    for i, dbfile in enumerate(args.db):
        name = args.output_prefix + os.path.basename(dbfile)
        outfp = open(os.path.join(args.outdir, name) + '.sweep', 'w')
        outputs[i] = IODeque(args.max_queue_size, outfp)
        for n, record in enumerate(iter_records(dbfile)):
            if n % 50000 == 0:
                print('...consumed {0} sequences...'.format(n),
                      file=sys.stderr)
            lh._consume_sequence_and_tag_with_labels(record.cleaned_seq, i)

    print('done consuming input sequence. added {0} tags and {1} '
          'labels...'.format(graph.n_tags(), lh.n_labels), file=sys.stderr)

    n_orphaned = 0
    n_labeled = 0
    n_mlabeled = 0

    for read_file in args.query:
        print('** sweeping {0} for labels...'.format(read_file),
              file=sys.stderr)
        try:
            read_it = iter_records(read_file)
        except IOError as error:
            print('!! ERROR: !!', error, file=sys.stderr)
            print('*** Could not open {0}, skipping...'.format(read_file),
                  file=sys.stderr)
            continue
        for n, record in enumerate(read_it):
            if n % 50000 == 0 and n > 0:
                print('\tswept {0} reads [{1} labeled, {2} orphaned]'
                      .format(n, n_labeled, n_orphaned), file=sys.stderr)
            seq = record.sequence
            if len(seq) < args.ksize:
                continue
            labels = lh.sweep_label_neighborhood(seq, traversal_range)
            if labels:
                n_labeled += 1
                if len(labels) > 1:
                    n_mlabeled += 1
                for label in labels:
                    outputs[label].append(record)
            else:
                n_orphaned += 1
        print('** End of file {0}...'.format(read_file), file=sys.stderr)

    print('** End of run...', file=sys.stderr)
    for q in outputs.values():
        q.clear()
        q.outfp.close()

    print('swept {0}...'.format(n_labeled + n_orphaned), file=sys.stderr)
    print('...with {0} labeled and {1} orphaned'.format(
        n_labeled, n_orphaned), file=sys.stderr)
    print('...and {0} multilabeled'.format(n_mlabeled), file=sys.stderr)


if __name__ == '__main__':
    main()
