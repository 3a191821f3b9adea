#!/usr/bin/env python
"""Partition reads by which assembled contig they connect to.

Sandbox-tier equivalent of reference
sandbox/sweep-out-reads-with-contigs.py:44-69: tag every k-mer of the
contigs (tag density 0), partition the contig graph, then annotate the
reads file with the partition of the contig each read touches
(output_partitions with output_unassigned=True).

% python sandbox/sweep-out-reads-with-contigs.py <reads> <contigs> [out]
"""

import os
import sys

from _sandbox import iter_records  # noqa: F401

from khmer_tpu import Nodegraph

K = 20


def main():
    readsfile = sys.argv[1]
    contigfile = sys.argv[2]
    outfile = os.path.basename(readsfile) + '.sweep'
    if len(sys.argv) == 4:
        outfile = sys.argv[3]

    ht = Nodegraph(K, 1e7, 4)

    # tag every k-mer in the contigs
    ht._set_tag_density(0)

    print('loading contigs from', contigfile, file=sys.stderr)
    ht.consume_seqfile_and_tag(contigfile)
    subset = ht.do_subset_partition(0, 0)
    ht.merge_subset(subset)

    print('outputting contig-partitioned reads to', outfile,
          file=sys.stderr)
    ht.output_partitions(readsfile, outfile, True)


if __name__ == '__main__':
    main()
