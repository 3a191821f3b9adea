#!/usr/bin/env python
"""Sort reads into per-label files by sweeping them against a labeled
reference graph.

Sandbox-tier equivalent of reference sandbox/sweep-reads.py:236-430:
label a nodegraph from a (partitioned) reference FASTA — by partition
id, per-sequence ordinal, or fixed-size groups — then sweep each query
read's graph neighborhood for labels and append the read to a buffered
per-label output file (plus 'multi' and 'orphaned' buckets). Emits the
label-count CSV and label-number distribution like the reference.

% sweep-reads.py -r <range> --label-by-pid <contigs fastp> <reads> ...
"""

import os
import sys
from collections import defaultdict

from _sandbox import iter_records  # noqa: F401

from khmer_tpu import GraphLabels
from khmer_tpu.cli.args import (build_nodegraph_args, create_nodegraph,
                                report_on_config, sanitize_help)
from khmer_tpu.io.fastx import write_record
from khmer_tpu.utils.kfile import (check_input_files, check_space,
                                   check_valid_file_exists)

DEFAULT_NUM_BUFFERS = 50000
DEFAULT_MAX_READS = 1000000
DEFAULT_BUFFER_SIZE = 10
DEFAULT_OUT_PREF = 'reads'

MAX_HSIZE = 4e7
MIN_KSIZE = 21


def fmt_fasta(name, seq, labels=()):
    return '>{0}\t{1}\n{2}\n'.format(
        name, '\t'.join(str(l) for l in labels), seq)


def fmt_fastq(name, seq, quality, labels=()):
    return '@{0}\t{1}\n{2}\n+\n{3}\n'.format(
        name, '\t'.join(str(l) for l in labels), seq, quality)


class ReadBufferManager:
    """Per-label append buffers flushed to files on thresholds
    (reference sandbox/sweep-reads.py:119-190)."""

    def __init__(self, max_buffers, max_reads, max_size, output_pref,
                 outdir, extension):
        self.buffers = {}
        self.max_buffers = max_buffers
        self.max_reads = max_reads
        self.buffer_flush = max_size
        self.output_pref = output_pref
        self.outdir = outdir
        self.extension = extension
        self.cur_reads = 0
        self.num_write_errors = 0
        self.num_file_errors = 0

    def flush_buffer(self, buf_id):
        fn = '{0}_{1}.{2}'.format(self.output_pref, buf_id, self.extension)
        fpath = os.path.join(self.outdir, fn)
        buf = self.buffers[buf_id]
        try:
            with open(fpath, 'a') as outfp:
                outfp.write(''.join(buf))
        except (IOError, OSError) as err:
            print('!! ERROR: {0} !!'.format(err), file=sys.stderr)
            print('*** Failed to open {0} for buffer flush'.format(fpath),
                  file=sys.stderr)
            self.num_file_errors += 1
        finally:
            self.cur_reads -= len(buf)
            del self.buffers[buf_id]

    def queue(self, seq_str, buf_id):
        self.buffers.setdefault(buf_id, []).append(seq_str)
        if len(self.buffers[buf_id]) >= self.buffer_flush:
            self.flush_buffer(buf_id)
        self.cur_reads += 1
        if self.cur_reads > self.max_reads:
            print('** Reached max num reads...', file=sys.stderr)
            self.flush_all()
        if len(self.buffers) > self.max_buffers:
            print('** Reached max num buffers...', file=sys.stderr)
            self.flush_all()

    def flush_all(self):
        print('*** Flushing all to files...', file=sys.stderr)
        for buf_id in list(self.buffers):
            self.flush_buffer(buf_id)
        assert self.cur_reads == 0


def get_parser():
    parser = build_nodegraph_args(
        'Takes a partitioned reference file and a list of reads, and '
        'sorts reads by which partition they connect to')
    parser.add_argument('-r', '--traversal_range', type=int,
                        dest='traversal_range', default=None,
                        help='depth of breadth-first search from each read')
    parser.add_argument('-b', '--buffer_size', dest='max_reads', type=int,
                        default=DEFAULT_MAX_READS,
                        help='Max total reads to buffer before flushing')
    parser.add_argument('-l', '--buffer_length', dest='buffer_size',
                        type=int, default=DEFAULT_BUFFER_SIZE,
                        help='Max length of a label buffer before flushing')
    parser.add_argument('--prefix', dest='output_prefix',
                        default=DEFAULT_OUT_PREF,
                        help='Prefix for sorted read files')
    parser.add_argument('--outdir', dest='outdir',
                        help='output directory; default is location of '
                             'fastp file')
    parser.add_argument('-m', '--max_buffers', dest='max_buffers', type=int,
                        default=DEFAULT_NUM_BUFFERS,
                        help='Max individual label buffers before flushing')
    labeling = parser.add_mutually_exclusive_group(required=True)
    labeling.add_argument('--label-by-pid', dest='label_by_pid',
                          action='store_true',
                          help='separate reads by reference partition id')
    labeling.add_argument('--label-by-seq', dest='label_by_seq',
                          action='store_true',
                          help='separate reads by reference sequence')
    labeling.add_argument('--label-by-group', dest='group_size', type=int,
                          help='separate reads by groups of reference '
                               'sequences')
    parser.add_argument(dest='input_fastp', help='Reference fasta or fastp')
    parser.add_argument('input_files', nargs='+',
                        help='Reads to be swept and sorted')
    parser.add_argument('-f', '--force', default=False, action='store_true',
                        help='Overwrite output file if it exists')
    return parser


def main():
    parser = sanitize_help(get_parser())
    args = parser.parse_args()

    if args.max_tablesize < MAX_HSIZE:
        args.max_tablesize = MAX_HSIZE
    if args.ksize < MIN_KSIZE:
        args.ksize = MIN_KSIZE

    report_on_config(args, graphtype='nodegraph')

    traversal_range = args.traversal_range
    input_fastp = args.input_fastp
    outdir = args.outdir or os.path.dirname(input_fastp)

    check_input_files(args.input_fastp, args.force)
    check_valid_file_exists(args.input_files)
    check_space([input_fastp] + args.input_files, args.force)

    # input file type (FA/FQ) from the first query record
    first = next(iter(iter_records(args.input_files[0])))
    extension = 'fq' if first.quality else 'fa'

    output_buffer = ReadBufferManager(
        args.max_buffers, args.max_reads, args.buffer_size,
        args.output_prefix, outdir, extension)

    graph = create_nodegraph(args)
    lh = GraphLabels(graph)
    print('consuming input sequences...', file=sys.stderr)
    if args.label_by_pid:
        print('...labeling by partition id (pid)', file=sys.stderr)
        lh.consume_partitioned_fasta_and_tag_with_labels(input_fastp)
    elif args.label_by_seq:
        print('...labeling by sequence', file=sys.stderr)
        for n, record in enumerate(iter_records(input_fastp)):
            if n % 50000 == 0:
                print('...consumed {0} sequences...'.format(n),
                      file=sys.stderr)
            lh._consume_sequence_and_tag_with_labels(record.cleaned_seq, n)
    else:
        print('...labeling to create groups of size {0}'.format(
            args.group_size), file=sys.stderr)
        label = -1
        g = 0
        outfp = open('{0}_base_{1}.{2}'.format(
            args.output_prefix, g, extension), 'w')
        for n, record in enumerate(iter_records(input_fastp)):
            if n % args.group_size == 0:
                label += 1
                if label > g:
                    g = label
                    outfp.close()
                    outfp = open('{0}_base_{1}.{2}'.format(
                        args.output_prefix, g, extension), 'w')
            if n % 50000 == 0:
                print('...consumed {0} sequences...'.format(n),
                      file=sys.stderr)
            lh._consume_sequence_and_tag_with_labels(record.cleaned_seq,
                                                     label)
            write_record(record, outfp)
        outfp.close()

    print('done consuming input sequence. added {0} tags and {1} '
          'labels...'.format(graph.n_tags(), lh.n_labels), file=sys.stderr)

    label_dict = defaultdict(int)
    label_number_dist = []
    n_orphaned = 0
    n_labeled = 0
    n_mlabeled = 0

    for read_file in args.input_files:
        print('** sweeping {0} for labels...'.format(read_file),
              file=sys.stderr)
        try:
            read_it = iter_records(read_file)
        except (IOError, OSError) as error:
            print('!! ERROR: !!', error, file=sys.stderr)
            print('*** Could not open {0}, skipping...'.format(read_file),
                  file=sys.stderr)
            continue
        for i, record in enumerate(read_it):
            if i % 50000 == 0:
                print('\tswept {0} reads [{1} labeled, {2} orphaned]'
                      .format(i, n_labeled, n_orphaned), file=sys.stderr)
            seq = record.sequence
            name = record.name
            try:
                # None -> default (2*tag_density)+1 sweep radius,
                # matching the reference binding's radius=None path
                labels = list(lh.sweep_label_neighborhood(
                    seq, traversal_range))
            except ValueError:
                continue
            if record.quality:
                seq_str = fmt_fastq(name, seq, record.quality, labels)
            else:
                seq_str = fmt_fasta(name, seq, labels)
            label_number_dist.append(len(labels))
            if labels:
                n_labeled += 1
                if len(labels) > 1:
                    output_buffer.queue(seq_str, 'multi')
                    n_mlabeled += 1
                    label_dict['multi'] += 1
                else:
                    output_buffer.queue(seq_str, labels[0])
                    label_dict[labels[0]] += 1
            else:
                n_orphaned += 1
                output_buffer.queue(seq_str, 'orphaned')
                label_dict['orphaned'] += 1
        print('** End of file {0}...'.format(read_file), file=sys.stderr)
        output_buffer.flush_all()

    print('** End of run...', file=sys.stderr)
    output_buffer.flush_all()

    if output_buffer.num_write_errors or output_buffer.num_file_errors:
        print('! WARNING: Sweep finished with errors !', file=sys.stderr)
        print('** {0} reads not written'.format(
            output_buffer.num_write_errors), file=sys.stderr)
        print('** {0} errors opening files'.format(
            output_buffer.num_file_errors), file=sys.stderr)

    print('swept {0} for labels...'.format(n_labeled + n_orphaned),
          file=sys.stderr)
    print('...with {0} labeled and {1} orphaned'.format(
        n_labeled, n_orphaned), file=sys.stderr)
    print('...and {0} multilabeled'.format(n_mlabeled), file=sys.stderr)

    print('** outputting label number distribution...', file=sys.stderr)
    fn = os.path.join(outdir, '{0}.dist.txt'.format(args.output_prefix))
    with open(fn, 'w') as outfp:
        for nc in label_number_dist:
            outfp.write('{0}\n'.format(nc))

    fn = os.path.join(outdir, '{0}.counts.csv'.format(args.output_prefix))
    print('** outputting label read counts...', file=sys.stderr)
    with open(fn, 'w') as outfp:
        for key in label_dict:
            outfp.write('{0},{1}\n'.format(key, label_dict[key]))


if __name__ == '__main__':
    main()
