#!/usr/bin/env python
"""Re-assemble contigs with the labeled assembler.

Sandbox-tier equivalent of reference sandbox/reassemble-contigs.py:
9-50: consume the contigs into a nodegraph, collect high-degree nodes,
label each contig across them, then run a labeled assembly from every
contig's first k-mer and print the results as FASTA on stdout.

% python sandbox/reassemble-contigs.py <contig files...>
"""

import argparse
import sys

from _sandbox import iter_records  # noqa: F401

from khmer_tpu import GraphLabels, Nodegraph

K = 31


def main():
    p = argparse.ArgumentParser()
    p.add_argument('contig_files', nargs='+')
    args = p.parse_args()

    ng = Nodegraph(K, 1e8, 4)
    starts = []

    for filename in args.contig_files:
        for n, record in enumerate(iter_records(filename)):
            if n and n % 10000 == 0:
                print('...', n, file=sys.stderr)
            ng.consume(record.sequence)
            starts.append(record.sequence[:K])

    hdn = set()
    for filename in args.contig_files:
        for n, record in enumerate(iter_records(filename)):
            if n and n % 10000 == 0:
                print('...', n, file=sys.stderr)
            hdn.update(ng.find_high_degree_nodes(record.sequence))

    lh = GraphLabels(ng)
    for filename in args.contig_files:
        for n, record in enumerate(iter_records(filename)):
            if n and n % 10000 == 0:
                print('...', n, file=sys.stderr)
            lh.label_across_high_degree_nodes(record.sequence, hdn, n)

    counter = 0
    for kstart in starts:
        contigs = lh.assemble_labeled_path(kstart)
        if not contigs:
            print('nada...', file=sys.stderr)
        for c in contigs:
            print('>%d\n%s' % (counter, c))
            counter += 1


if __name__ == '__main__':
    main()
