#!/usr/bin/env python
"""Streaming junction-count assembly with transcript/ORF/stats outputs.

Sandbox-tier equivalent of reference
sandbox/streaming-assembly-simple.py:71-143: reads below coverage 20
are consumed; 20-29 are trimmed and fed to the JunctionCountAssembler;
at exactly 30 contigs are assembled from the read's first k-mer and
written to <prefix>.transcripts.fa with novel ORFs to <prefix>.orfs.fa
and per-read actions to <prefix>.stats.fa.

% python sandbox/streaming-assembly-simple.py [--prefix P] <fastq...>
"""

import csv
import sys

from _sandbox import extract_orfs, iter_records, translate

from khmer_tpu import JunctionCountAssembler
from khmer_tpu.cli.args import build_counting_args, create_countgraph


def main():
    p = build_counting_args(descr='Streaming assembly with tracking info')
    p.add_argument('fastq_files', nargs='+')
    p.add_argument('--prefix', default='transcriptome')
    args = p.parse_args()

    cg = create_countgraph(args)
    asm = JunctionCountAssembler(cg)

    tr_fn = '{0}.transcripts.fa'.format(args.prefix)
    orf_fn = '{0}.orfs.fa'.format(args.prefix)
    stats_fn = '{0}.stats.fa'.format(args.prefix)

    with open(tr_fn, 'w') as tr_fp, \
            open(orf_fn, 'w') as orf_fp, \
            open(stats_fn, 'w') as stats_fp:

        kept = 0
        next_contig = 1
        next_orf = 1
        output = set()
        statswriter = csv.DictWriter(
            stats_fp, delimiter=',',
            fieldnames=['read_n', 'action', 'cov', 'n_junctions',
                        'contig_n'])

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
                                          'cov': cov, 'n_junctions': None,
                                          'contig_n': None})
                elif cov < 30:
                    seq, _pos = cg.trim_on_abundance(record.sequence, 3)
                    if len(seq) < args.ksize:
                        continue
                    n_junctions = asm.consume(seq)
                    statswriter.writerow({'read_n': n, 'action': 't',
                                          'cov': cov,
                                          'n_junctions': n_junctions,
                                          'contig_n': None})
                elif cov == 30:
                    contigs = asm.assemble(record.sequence[:args.ksize])
                    for contig_n, contig in enumerate(contigs):
                        statswriter.writerow(
                            {'read_n': n, 'action': 'a', 'cov': cov,
                             'n_junctions': None,
                             'contig_n': (next_contig, contig_n)})
                        tr_fp.write('>contig%d\n%s\n' % (next_contig,
                                                         contig))
                        next_contig += 1
                        for t in translate(contig):
                            for o in extract_orfs(t):
                                if hash(o) not in output:
                                    output.add(hash(o))
                                    orf_fp.write('>orf%d\n%s\n'
                                                 % (next_orf, o))
                                    next_orf += 1
                else:
                    statswriter.writerow({'read_n': n, 'action': 's',
                                          'cov': cov, 'n_junctions': None,
                                          'contig_n': None})


if __name__ == '__main__':
    main()
