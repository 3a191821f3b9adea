#!/usr/bin/env python
"""Uniformly subsample sequences using reservoir sampling.

Behavioral contract of reference scripts/sample-reads-randomly.py
(paired-aware, -S multi-sample, -M scan cap checked at report
intervals). The RNG consumption order matches the reference exactly,
so a fixed -R seed reproduces the reference's sample.

% sample-reads-randomly.py <infile>
"""

import os
import random
import sys
import textwrap

from khmer_tpu.cli.args import (FileType as khFileType,
                                KhmerArgumentParser, sanitize_help)
from khmer_tpu.io.fastx import ReadParser, write_record
from khmer_tpu.io.pairing import broken_paired_reader
from khmer_tpu.utils.kfile import (add_output_compression_type,
                                   check_input_files, get_file_writer)

DEFAULT_NUM_READS = int(1e5)
DEFAULT_MAX_READS = int(1e8)
REPORT_EVERY = 10000


class PairedReservoirs:
    """S independent uniform reservoirs over a shared bundle stream.

    Classic algorithm-R, with the reference's RNG discipline: one
    randint(1, count) draw per reservoir per overflowing bundle, in
    reservoir order (scripts/sample-reads-randomly.py:146-150).
    """

    def __init__(self, capacity, n_reservoirs):
        self.capacity = capacity
        self.pools = [[] for _ in range(n_reservoirs)]
        self.count = 0

    def offer(self, bundle):
        count = self.count
        self.count += 1
        if count < self.capacity:
            for pool in self.pools:
                pool.append(bundle)
            return
        for pool in self.pools:
            guess = random.randint(1, count)
            if guess <= self.capacity:
                pool[guess - 1] = bundle


def get_parser():
    epilog = """\
    Take a list of files containing sequences, and subsample 100,000
    sequences (:option:`-N`/:option:`--num_reads`) uniformly, using
    reservoir sampling.  Stop after first 100m sequences
    (:option:`-M`/:option:`--max_reads`). By default take one subsample,
    but take :option:`-S`/:option:`--samples` samples if specified.

    The first non-option argument is a list of files containing
    sequences to sample from; the file(s) can be gzipped or bzipped.

    The output is placed in :option:`-o`/:option:`--output` <file>
    (for a single sample) or in <file>.subset.0 to <file>.subset.S-1
    (for more than one sample).

    This script uses the `reservoir sampling
    <http://en.wikipedia.org/wiki/Reservoir_sampling>`__ algorithm.
    """
    parser = KhmerArgumentParser(
        description="Uniformly subsample sequences from a collection of "
        "files", epilog=textwrap.dedent(epilog), citations=['SeqAn'])
    parser.add_argument('filenames', nargs='+')
    parser.add_argument('-N', '--num_reads', type=int, dest='num_reads',
                        default=DEFAULT_NUM_READS, help='samples the '
                        'number of sequences or pairs specified with -N')
    parser.add_argument('-M', '--max_reads', type=int, dest='max_reads',
                        default=DEFAULT_MAX_READS)
    parser.add_argument('-S', '--samples', type=int, dest='num_samples',
                        default=1)
    parser.add_argument('-R', '--random-seed', type=int,
                        dest='random_seed')
    parser.add_argument('--force_single', default=False,
                        action='store_true',
                        help='Ignore read pair information if present')
    parser.add_argument('-o', '--output', dest='output_file',
                        type=khFileType('wb'),
                        metavar="filename", default=None)
    parser.add_argument('-f', '--force', default=False,
                        action='store_true',
                        help='Overwrite output file if it exits')
    add_output_compression_type(parser)
    return parser


def _resolve_output_name(args):
    """Output base name, with the reference's stdin/-o consistency
    checks."""
    if args.output_file:
        if max(args.num_samples, 1) > 1:
            sys.stderr.write(
                "Error: cannot specify -o with more than one sample.")
            if not args.force:
                print("NOTE: This can be overridden using the --force"
                      " argument", file=sys.stderr)
                sys.exit(1)
        return args.output_file.name
    first = args.filenames[0]
    if first in ('/dev/stdin', '-'):
        print("Accepting input from stdin; output filename must "
              "be provided with '-o'.", file=sys.stderr)
        sys.exit(1)
    return os.path.basename(first) + '.subset'


def _announce(num_reads, num_samples, output_filename):
    if num_samples == 1:
        print('Subsampling %d reads using reservoir sampling.' % num_reads,
              file=sys.stderr)
        print('Subsampled reads will be placed in %s' % output_filename,
              file=sys.stderr)
    else:
        print('Subsampling %d reads, %d times,' % (num_reads, num_samples),
              ' using reservoir sampling.', file=sys.stderr)
        print('Subsampled reads will be placed in %s.N' % output_filename,
              file=sys.stderr)
    print('', file=sys.stderr)


def _scan(filenames, reservoirs, max_reads, force_single):
    """Feed every bundle to the reservoirs; honor the reference's
    check-the-cap-only-at-report-interval quirk."""
    for filename in filenames:
        print('opening', filename, 'for reading', file=sys.stderr)
        stream = broken_paired_reader(ReadParser(filename),
                                      force_single=force_single)
        for count, (_, _, rcrd1, rcrd2) in enumerate(stream):
            if count % REPORT_EVERY == 0:
                print('...', count, 'reads scanned', file=sys.stderr)
                if count >= max_reads:
                    print('reached upper limit of %d reads' % max_reads,
                          '(see -M); exiting', file=sys.stderr)
                    break
            reservoirs.offer((rcrd1, rcrd2))


def _write_pool(pool, fp):
    for first, second in pool:
        write_record(first, fp)
        if second is not None:
            write_record(second, fp)


def main():
    parser = get_parser()
    parser.epilog = parser.epilog.replace(
        "`reservoir sampling\n"
        "<http://en.wikipedia.org/wiki/Reservoir_sampling>`__ algorithm.",
        "reservoir sampling algorithm. "
        "http://en.wikipedia.org/wiki/Reservoir_sampling")
    args = sanitize_help(parser).parse_args()

    for name in args.filenames:
        check_input_files(name, args.force)
    if args.random_seed:
        random.seed(args.random_seed)

    num_samples = max(args.num_samples, 1)
    output_filename = _resolve_output_name(args)
    _announce(args.num_reads, num_samples, output_filename)

    reservoirs = PairedReservoirs(args.num_reads, num_samples)
    _scan(args.filenames, reservoirs, args.max_reads, args.force_single)

    if num_samples == 1:
        pool = reservoirs.pools[0]
        print('Writing %d sequences to %s' % (len(pool), output_filename),
              file=sys.stderr)
        out = args.output_file or open(output_filename, 'wb')
        _write_pool(pool, get_file_writer(out, args.gzip, args.bzip))
    else:
        for n, pool in enumerate(reservoirs.pools):
            n_filename = '%s.%d' % (output_filename, n)
            print('Writing %d sequences to %s' % (len(pool), n_filename),
                  file=sys.stderr)
            _write_pool(pool, get_file_writer(open(n_filename, 'wb'),
                                              args.gzip, args.bzip))


if __name__ == '__main__':
    main()
