#!/usr/bin/env python
"""Extract reads that did not end up in an assembly (label version).

Sandbox-tier equivalent of reference
sandbox/extract-unassembled-reads.py:36-85: tag the reads into a
nodegraph, then consume+label the assembly; a read is "unassembled" if
any of its tags carries no assembly label. Output goes to -o or
basename(<readfile>).leftover2.

% python sandbox/extract-unassembled-reads.py <assembly> <reads> ...
"""

import argparse
import os
import sys

from _sandbox import iter_records  # noqa: F401

from khmer_tpu import GraphLabels, Nodegraph
from khmer_tpu.io.fastx import write_record


def main():
    p = argparse.ArgumentParser()
    p.add_argument('assembly')
    p.add_argument('readfiles', nargs='+')
    p.add_argument('-k', '--ksize', type=int, default=31)
    p.add_argument('-x', '--tablesize', type=float, default=1e8)
    p.add_argument('-o', '--output')
    args = p.parse_args()

    ng = Nodegraph(args.ksize, args.tablesize, 4)

    for readfile in args.readfiles:
        print('loading & tagging reads from:', readfile, file=sys.stderr)
        ng.consume_seqfile_and_tag(readfile)

    print('loading & tagging assembly from:', args.assembly,
          file=sys.stderr)
    lh = GraphLabels(ng)
    lh.consume_seqfile_and_tag_with_labels(args.assembly)

    outfp = open(args.output, 'w') if args.output else None

    n = 0
    m = 0
    for readfile in args.readfiles:
        print('loading reads from:', readfile, file=sys.stderr)
        if not args.output:
            outfile = os.path.basename(readfile) + '.leftover2'
            outfp = open(outfile, 'w')
            print('writing to:', outfile, file=sys.stderr)

        for record in iter_records(readfile):
            if n % 100000 == 0 and n:
                print('...', readfile, n, m, file=sys.stderr)
            tags = ng.get_tags_and_positions(record.sequence)

            do_extract = False
            for _pos, tag in tags:
                if not lh.get_tag_labels(tag):
                    do_extract = True
                    break

            if do_extract:
                write_record(record, outfp)
                m += 1
            n += 1

        if not args.output:
            outfp.close()

    print('%d left out of assembly, of %d reads' % (m, n), file=sys.stderr)


if __name__ == '__main__':
    main()
