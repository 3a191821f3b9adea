#!/usr/bin/env python
"""Streaming labeled assembly: assemble contigs and print ORFs as
coverage saturates, in one pass over the reads.

Sandbox-tier equivalent of reference sandbox/assemble-on-the-go.py:
70-117: reads below coverage 20 are consumed; reads between 20 and 30
are abundance-trimmed, consumed, and labeled across high-degree nodes;
at coverage exactly 30 a labeled assembly is attempted from the read's
first k-mer and novel ORFs (six-frame, >= 99 aa) are printed.

% python sandbox/assemble-on-the-go.py <fastq files...>
"""

import argparse
import sys

from _sandbox import extract_orfs, iter_records, translate

from khmer_tpu import Countgraph, GraphLabels

K = 21


def main():
    p = argparse.ArgumentParser()
    p.add_argument('fastq_files', nargs='+')
    args = p.parse_args()

    cg = Countgraph(K, 1e8, 4)

    kept = 0
    lh = GraphLabels(cg)
    next_label = 1
    next_orf = 1
    output = set()

    for filename in args.fastq_files:
        for n, record in enumerate(iter_records(filename)):
            if n and n % 10000 == 0:
                print('...', n, file=sys.stderr)

            if len(record.sequence) < K:
                continue

            cov, _, _ = cg.get_median_count(record.sequence)
            if cov < 20:
                kept += 1
                cg.consume(record.sequence)
            elif cov < 30:
                seq, _pos = cg.trim_on_abundance(record.sequence, 3)
                if len(seq) < K:
                    continue
                cg.consume(seq)
                hdn = cg.find_high_degree_nodes(seq)
                lh.label_across_high_degree_nodes(seq, hdn, next_label)
                next_label += 1
            elif cov == 30:
                contigs = lh.assemble_labeled_path(record.sequence[:K])
                for contig in contigs:
                    for t in translate(contig):
                        for o in extract_orfs(t):
                            if hash(o) not in output:
                                output.add(hash(o))
                                print('>orf%d\n%s' % (next_orf, o))
                                next_orf += 1


if __name__ == '__main__':
    main()
