#!/usr/bin/env python
"""Semi-streaming error correction of low-abundance k-mers in reads.

Sandbox-tier equivalent of the reference sandbox/correct-reads.py:
two-pass streaming (like trim-low-abund) where high-coverage reads are
corrected against the graph with the HMM ReadAligner instead of being
trimmed.

% python sandbox/correct-reads.py [ -C <cutoff> ] <data1> <data2> ...
"""

import os
import shutil
import sys
import tempfile
import textwrap

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

from khmer_tpu import ReadAligner, load_countgraph
from khmer_tpu.cli import args as khmer_args
from khmer_tpu.cli.args import (add_loadgraph_args, build_counting_args,
                                calculate_graphsize, report_on_config,
                                sanitize_help)
from khmer_tpu.io.fastx import ReadParser, write_record, write_record_pair
from khmer_tpu.io.pairing import broken_paired_reader
from khmer_tpu.utils.kfile import (check_space, check_space_for_graph,
                                   check_valid_file_exists)

DEFAULT_NORMALIZE_LIMIT = 20
DEFAULT_CUTOFF = 2


def correct_sequence(aligner, sequence):
    """Align to the graph; on a full-length alignment return the
    graph-side sequence (reference sandbox/correct-reads.py:68-79)."""
    score, graph_alignment, read_alignment, truncated = \
        aligner.align(sequence)
    if not truncated:
        graph_seq = graph_alignment.replace("-", "")
        return True, graph_seq
    return False, sequence


def fix_quality(record):
    if len(record.sequence) < len(record.quality):
        record.quality = record.quality[: len(record.sequence)]
    while len(record.sequence) > len(record.quality):
        record.quality += 'I'


def get_parser():
    epilog = """
    The output is one file for each input file, <input file>.corr,
    placed in the current directory.  This output contains the input
    sequences, corrected at low-abundance k-mers.
    """
    parser = build_counting_args(
        descr='Correct reads against an already-computed table',
        epilog=textwrap.dedent(epilog), citations=['counting'])
    parser.add_argument("--trusted-cov", dest="cutoff", type=int,
                        default=DEFAULT_CUTOFF)
    parser.add_argument("--theta", dest="bits_theta", type=float,
                        default=1.0)
    parser.add_argument('--normalize-to', '-Z', type=int,
                        dest='normalize_to',
                        help='base cutoff on this median k-mer abundance',
                        default=DEFAULT_NORMALIZE_LIMIT)
    parser.add_argument('-s', '--savegraph', metavar="filename",
                        default='',
                        help='save the k-mer countgraph to disk')
    add_loadgraph_args(parser)
    parser.add_argument('--tempdir', '-T', type=str, default='./')
    parser.add_argument('--ignore-pairs', default=False,
                        action='store_true')
    parser.add_argument('input_filenames', nargs='+')
    parser.add_argument('--force', default=False, action='store_true')
    return parser


def main():
    args = sanitize_help(get_parser()).parse_args()

    if len(set(args.input_filenames)) != len(args.input_filenames):
        print("Error: Cannot input the same filename multiple times.",
              file=sys.stderr)
        sys.exit(1)

    report_on_config(args)
    check_valid_file_exists(args.input_filenames)
    check_space(args.input_filenames, args.force)
    tablesize = calculate_graphsize(args, 'countgraph')
    if args.savegraph:
        check_space_for_graph(args.savegraph, tablesize, args.force)

    K = args.ksize
    NORMALIZE_LIMIT = args.normalize_to

    if args.loadgraph:
        print('loading k-mer countgraph from', args.loadgraph,
              file=sys.stderr)
        ct = load_countgraph(args.loadgraph)
    else:
        print('making k-mer countgraph', file=sys.stderr)
        ct = khmer_args.create_countgraph(args, multiplier=8 / (9. + 0.3))
    tempdir = tempfile.mkdtemp('khmer', 'tmp', args.tempdir)

    aligner = ReadAligner(ct, args.cutoff, args.bits_theta)

    corrected_reads = 0
    pass2list = []
    for filename in args.input_filenames:
        pass2filename = os.path.join(
            tempdir, os.path.basename(filename) + '.pass2')
        corrfp = open(os.path.basename(filename) + '.corr', 'w')
        pass2list.append((filename, pass2filename, corrfp))
        pass2fp = open(pass2filename, 'w')

        paired_iter = broken_paired_reader(
            ReadParser(filename), min_length=K,
            force_single=args.ignore_pairs)
        for n, is_pair, read1, read2 in paired_iter:
            reads = [r for r in (read1, read2) if r]
            seqs = [r.sequence.replace('N', 'A') for r in reads]
            meds = [ct.get_median_count(s)[0] for s in seqs]
            if min(meds) < NORMALIZE_LIMIT:
                for r, s in zip(reads, seqs):
                    ct.consume(s)
                    write_record(r, pass2fp)
            else:
                for r, s in zip(reads, seqs):
                    is_aligned, new_seq = correct_sequence(aligner, s)
                    if is_aligned:
                        if new_seq != r.sequence:
                            corrected_reads += 1
                        r.sequence = new_seq
                        if r.quality is not None:
                            fix_quality(r)
                    write_record(r, corrfp)
        pass2fp.close()

    # second pass: correct the reads set aside
    for filename, pass2filename, corrfp in pass2list:
        print('second pass: looking at sequences kept aside in %s'
              % pass2filename, file=sys.stderr)
        for n, is_pair, read1, read2 in broken_paired_reader(
                ReadParser(pass2filename), min_length=K,
                force_single=args.ignore_pairs):
            for r in (read1, read2):
                if r is None:
                    continue
                seq = r.sequence.replace('N', 'A')
                med, _, _ = ct.get_median_count(seq)
                if med >= NORMALIZE_LIMIT:
                    is_aligned, new_seq = correct_sequence(aligner, seq)
                    if is_aligned:
                        if new_seq != r.sequence:
                            corrected_reads += 1
                        r.sequence = new_seq
                        if r.quality is not None:
                            fix_quality(r)
                write_record(r, corrfp)
        os.unlink(pass2filename)

    shutil.rmtree(tempdir)
    print('corrected %d reads' % corrected_reads, file=sys.stderr)

    if args.savegraph:
        print("Saving k-mer countgraph to", args.savegraph,
              file=sys.stderr)
        ct.save(args.savegraph)


if __name__ == '__main__':
    main()
