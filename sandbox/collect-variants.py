#!/usr/bin/env python
"""Collect reads likely to carry variants, via graph alignment.

Sandbox-tier equivalent of reference sandbox/collect-variants.py:
53-180: align each read to the countgraph with the HMM ReadAligner;
keep (and consume) reads whose alignment truncates or whose corrected
sequence has a minimum count below --normalize-to — i.e. reads not yet
saturated in the graph. Output: basename(<input>).keepvar.

% python sandbox/collect-variants.py [-C <cutoff>] <data1> <data2> ...
"""

import os
import sys

from _sandbox import iter_records  # noqa: F401

from khmer_tpu import ReadAligner, calc_expected_collisions, \
    load_countgraph
from khmer_tpu.cli.args import build_counting_args, create_countgraph

DEFAULT_NORMALIZE_LIMIT = 20


def main():
    parser = build_counting_args(
        descr='Collect variant-bearing reads by graph alignment')
    parser.add_argument("-t", "--trusted-cutoff", dest="trusted_cutoff",
                        type=int, default=3)
    parser.add_argument("--bits-theta",
                        help="Tuning parameter controlling trade off of "
                             "speed vs alignment sensitivity",
                        default=1.0, type=float, dest="bits_theta")
    parser.add_argument('--normalize-to', '-Z', type=int,
                        dest='normalize_to',
                        help='base cutoff on abundance',
                        default=DEFAULT_NORMALIZE_LIMIT)
    parser.add_argument('-s', '--savehash', dest='savehash', default='')
    parser.add_argument('-l', '--loadhash', dest='loadhash', default='')
    parser.add_argument('--details-out', dest="details_out")
    parser.add_argument('input_filenames', nargs='+')
    parser.add_argument('-f', '--force', default=False,
                        action='store_true')
    args = parser.parse_args()

    if args.loadhash:
        print('loading hashtable from', args.loadhash, file=sys.stderr)
        ht = load_countgraph(args.loadhash)
    else:
        print('making hashtable', file=sys.stderr)
        ht = create_countgraph(args)

    aligner = ReadAligner(ht, args.trusted_cutoff, args.bits_theta)

    details_out = open(args.details_out, "w") if args.details_out \
        else None

    total = 0
    discarded = 0
    for input_filename in args.input_filenames:
        output_name = os.path.basename(input_filename) + '.keepvar'
        with open(output_name, 'w') as outfp:
            for n, record in enumerate(iter_records(input_filename)):
                if n > 0 and n % 10000 == 0:
                    print('... kept', total - discarded, 'of', total,
                          ', or',
                          int(100. - discarded / float(total) * 100.),
                          '%', file=sys.stderr)
                    print('... in file', input_filename, file=sys.stderr)

                total += 1
                if len(record.sequence) < args.ksize:
                    continue

                seq = record.sequence.upper().replace('N', 'A')

                score, graph_alignment, read_alignment, truncated = \
                    aligner.align(record.sequence)

                keep = False
                if truncated:
                    keep = True  # keep all truncated alignments
                else:
                    # the corrected sequence
                    graph_seq = graph_alignment.replace("-", "")
                    mincount = ht.get_min_count(graph_seq)
                    if mincount < args.normalize_to:
                        keep = True

                if details_out is not None:
                    details_out.write(
                        "+{7}\t{0:0.2f}\t{3}\t{4}\nread:      "
                        "{6}\ngraph_aln: {1}\nread_aln:  {2}\n"
                        "stored_seq:{5}\n".format(
                            score, graph_alignment, read_alignment,
                            truncated, keep, seq, record.sequence,
                            record.name))

                if keep:
                    ht.consume(seq)
                    outfp.write('>%s\n%s\n' % (record.name,
                                               record.sequence))
                else:
                    discarded += 1

        if total:
            print('DONE with', input_filename, '; kept',
                  total - discarded, 'of', total, 'or',
                  int(100. - discarded / float(total) * 100.), '%',
                  file=sys.stderr)
        print('output in', output_name, file=sys.stderr)

    if args.savehash:
        print('Saving hashfile', file=sys.stderr)
        print('...saving to', args.savehash, file=sys.stderr)
        ht.save(args.savehash)

    fp_rate = calc_expected_collisions(ht, args.force, max_false_pos=.2)
    print('fp rate estimated to be %1.3f' % fp_rate, file=sys.stderr)


if __name__ == '__main__':
    main()
