#!/usr/bin/env python
"""Count unique k-mers in a file with a Bloom filter (Nodegraph),
printing the incremental-unique count, n_occupied, and n_unique_kmers.

Sandbox-tier equivalent of reference sandbox/bloom-count.py:38-63.

% python sandbox/bloom-count.py <file> <ksize> <tablesize> <n_tables>
"""

import sys

from _sandbox import iter_records

from khmer_tpu import Nodegraph


def main():
    filename = sys.argv[1]
    ksize = int(sys.argv[2])
    table_size = int(sys.argv[3])
    n_tables = int(sys.argv[4])

    ht = Nodegraph(ksize, table_size, n_tables)

    n_unique = 0
    for record in iter_records(filename):
        sequence = record.sequence
        # batched membership-then-count: get all window counts first,
        # then consume — sequential-equivalent to the reference's
        # per-kmer get/count loop because a Bloom filter only
        # transitions 0 -> 1 (new-event count == n_unique delta).
        before = ht.n_unique_kmers()
        ht.consume(sequence)
        n_unique += ht.n_unique_kmers() - before

    print(n_unique)
    print(ht.n_occupied())
    print(ht.n_unique_kmers())


if __name__ == '__main__':
    main()
