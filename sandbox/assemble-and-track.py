#!/usr/bin/env python
"""Streaming labeled assembly with a per-read action log (CSV).

Sandbox-tier equivalent of reference sandbox/assemble-and-track.py:
71-135: like assemble-on-the-go, but every read appends a row
(read_n, action, cov, n_hdn, contig_n, orf_n, new) to the stats CSV —
action 'c' = consumed, 'l' = labeled, 'a' = assembled.

% python sandbox/assemble-and-track.py [-o stats.csv] <fastq files...>
"""

import argparse
import csv
import sys

from _sandbox import extract_orfs, iter_records, translate

from khmer_tpu import GraphLabels
from khmer_tpu.cli.args import build_counting_args, create_countgraph


def main():
    p = build_counting_args(descr='Streaming assembly with tracking info')
    p.add_argument('fastq_files', nargs='+')
    p.add_argument('-o', type=argparse.FileType('w'),
                   default='assembly-stats.csv')
    args = p.parse_args()

    cg = create_countgraph(args)

    kept = 0
    lh = GraphLabels(cg)
    next_label = 1
    next_orf = 1
    output = set()
    outfp = args.o if hasattr(args.o, 'write') else open(args.o, 'w')
    statswriter = csv.DictWriter(
        outfp, delimiter=',',
        fieldnames=['read_n', 'action', 'cov', 'n_hdn', 'contig_n',
                    'orf_n', 'new'])

    for filename in args.fastq_files:
        for n, record in enumerate(iter_records(filename)):
            if n and n % 10000 == 0:
                print('...', n, file=sys.stderr)

            if len(record.sequence) < args.ksize:
                continue

            cov, _, _ = cg.get_median_count(record.sequence)
            if cov < 20:
                kept += 1
                cg.consume(record.sequence)
                statswriter.writerow({'read_n': n, 'action': 'c',
                                      'cov': cov, 'n_hdn': None,
                                      'contig_n': None, 'orf_n': None,
                                      'new': None})
            elif cov < 30:
                seq, _pos = cg.trim_on_abundance(record.sequence, 3)
                if len(seq) < args.ksize:
                    continue
                cg.consume(seq)
                hdn = cg.find_high_degree_nodes(seq)
                lh.label_across_high_degree_nodes(seq, hdn, next_label)
                next_label += 1
                statswriter.writerow({'read_n': n, 'action': 'l',
                                      'cov': cov, 'n_hdn': len(hdn),
                                      'contig_n': None, 'orf_n': None,
                                      'new': None})
            elif cov == 30:
                contigs = lh.assemble_labeled_path(
                    record.sequence[:args.ksize])
                for contig_n, contig in enumerate(contigs):
                    statswriter.writerow({'read_n': n, 'action': 'a',
                                          'cov': cov, 'n_hdn': None,
                                          'contig_n': contig_n,
                                          'orf_n': None, 'new': None})
                    for t in translate(contig):
                        for orf_n, o in enumerate(extract_orfs(t)):
                            if hash(o) not in output:
                                new = True
                                output.add(hash(o))
                                print('>orf%d\n%s' % (next_orf, o))
                                next_orf += 1
                            else:
                                new = False
                            statswriter.writerow(
                                {'read_n': n, 'action': 'a', 'cov': cov,
                                 'n_hdn': None, 'contig_n': contig_n,
                                 'orf_n': orf_n, 'new': new})


if __name__ == '__main__':
    main()
