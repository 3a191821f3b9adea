#!/usr/bin/env python
"""
Eliminate reads with median k-mer abundance higher than DESIRED_COVERAGE
or coefficient-of-variation above 100%. Output sequences are placed in
'infile.keepmedpct'.

Sandbox-tier equivalent of reference sandbox/normalize-by-median-pct.py:45-200
(ported to the current khmer_args flag names; the reference still used the
pre-2.0 min_hashsize/n_hashes spellings).

% python sandbox/normalize-by-median-pct.py [ -C <cutoff> ] <data1> <data2> ...

Use '-h' for parameter help.
"""

import argparse
import os
import sys

from _sandbox import iter_records

import khmer_tpu
from khmer_tpu import Countgraph, load_countgraph
from khmer_tpu.cli.args import DEFAULT_MAX_TABLESIZE, build_counting_args

DEFAULT_DESIRED_COVERAGE = 5


def batchwise(t, size):
    it = iter(t)
    return zip(*[it] * size)


def validpair(read0, read1):
    return read0.name[-1] == "1" and \
        read1.name[-1] == "2" and \
        read0.name[0:-1] == read1.name[0:-1]


def main():
    parser = build_counting_args()
    parser.add_argument('-C', '--cutoff', type=int, dest='cutoff',
                        default=DEFAULT_DESIRED_COVERAGE)
    parser.add_argument('-p', '--paired', action='store_true')
    parser.add_argument('-s', '--savehash', dest='savehash', default='')
    parser.add_argument('-l', '--loadhash', dest='loadhash', default='')
    parser.add_argument('-R', '--report-to-file', dest='report_file',
                        type=argparse.FileType('w'))
    parser.add_argument('input_filenames', nargs='+')

    args = parser.parse_args()

    if not args.quiet:
        if args.max_tablesize == DEFAULT_MAX_TABLESIZE and not args.loadhash:
            print("** WARNING: tablesize is default!  "
                  "You absodefly want to increase this!\n"
                  "** Please read the docs!", file=sys.stderr)

        print('\nPARAMETERS:', file=sys.stderr)
        print(' - kmer size =    %d \t\t(-k)' % args.ksize, file=sys.stderr)
        print(' - n tables =     %d \t\t(-N)' % args.n_tables,
              file=sys.stderr)
        print(' - max tablesize = %-5.2g \t(-x)' % args.max_tablesize,
              file=sys.stderr)
        print(' - paired =	      %s \t\t(-p)' % args.paired,
              file=sys.stderr)
        print('', file=sys.stderr)
        print('Estimated memory usage is %.2g bytes '
              '(n_tables x max_tablesize)' %
              (args.n_tables * args.max_tablesize), file=sys.stderr)
        print('-' * 8, file=sys.stderr)

    ksize = args.ksize
    desired_coverage = args.cutoff
    report_fp = args.report_file
    filenames = args.input_filenames

    # In paired mode we read two records at a time
    batch_size = 2 if args.paired else 1

    if args.loadhash:
        print('loading hashtable from', args.loadhash)
        ht = load_countgraph(args.loadhash)
    else:
        print('making hashtable')
        ht = Countgraph(ksize, int(args.max_tablesize), args.n_tables)

    total = 0
    discarded = 0

    input_filename = None
    for input_filename in filenames:
        output_name = os.path.basename(input_filename) + '.keepmedpct'
        outfp = open(output_name, 'w')

        n = -1
        for n, batch in enumerate(batchwise(iter_records(input_filename),
                                            batch_size)):
            if n > 0 and n % 100000 == 0:
                print('... kept', total - discarded, 'of', total, ', or',
                      int(100. - discarded / float(total) * 100.), '%')
                print('... in file', input_filename)

                if report_fp:
                    print(total, total - discarded,
                          1. - (discarded / float(total)), file=report_fp)
                    report_fp.flush()

            total += batch_size

            if args.paired and not validpair(batch[0], batch[1]):
                print('Error: Improperly interleaved pairs %s %s' %
                      (batch[0].name, batch[1].name), file=sys.stderr)
                sys.exit(-1)

            # Emit the batch of reads if any read passes the filter
            # and all reads are longer than K
            passed_filter = False
            passed_length = True
            for record in batch:
                if len(record.sequence) < ksize:
                    passed_length = False
                    continue

                seq = record.sequence.replace('N', 'A')
                med, avg, dev = ht.get_median_count(seq)

                pct = 0.
                if avg:
                    pct = dev / avg * 100

                if med < desired_coverage and pct < 100:
                    ht.consume(seq)
                    passed_filter = True

            if passed_length and passed_filter:
                for record in batch:
                    if getattr(record, 'quality', None):
                        outfp.write('@%s\n%s\n+\n%s\n' % (record.name,
                                                          record.sequence,
                                                          record.quality))
                    else:
                        outfp.write('>%s\n%s\n' %
                                    (record.name, record.sequence))
            else:
                discarded += batch_size

        if -1 < n:
            print('DONE with', input_filename, '; kept',
                  total - discarded, 'of', total, 'or',
                  int(100. - discarded / float(total) * 100.), '%')
            print('output in', output_name)
        else:
            print('SKIPPED empty file', input_filename)

    if args.savehash:
        print('Saving hashfile through', input_filename)
        print('...saving to', args.savehash)
        ht.save(args.savehash)

    # Change 0.2 only if you really grok it.  HINT: You don't.
    fp_rate = khmer_tpu.calc_expected_collisions(ht, force=True)
    print('fp rate estimated to be %1.3f' % fp_rate)

    if fp_rate > 0.20:
        print("**", file=sys.stderr)
        print("** ERROR: the counting hash is too small for",
              file=sys.stderr)
        print("** this data set.  Increase hashsize/num ht.",
              file=sys.stderr)
        print("**", file=sys.stderr)
        print("** Do not use these results!!", file=sys.stderr)
        sys.exit(-1)


if __name__ == '__main__':
    main()
