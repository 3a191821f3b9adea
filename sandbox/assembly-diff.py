#!/usr/bin/env python
"""Compare two assemblies: write paths (from a third file) covered
>=90% by exactly one of the two assemblies to <file>.uniq.

Sandbox-tier equivalent of reference sandbox/assembly-diff.py:36-92, with
the per-k-mer membership loop replaced by one batched device lookup per
path.

% python sandbox/assembly-diff.py <assembly1> <assembly2> <paths>
"""

import os
import sys

from _sandbox import iter_records

from khmer_tpu import Nodegraph

K = 20
HASHTABLE_SIZE = int(2.5e8)
N_HT = 4

THRESHOLD = 0.9


def frac_present(kh, path):
    counts = kh.get_kmer_counts(path)
    if len(counts) == 0:
        return 0.0
    return float(sum(1 for c in counts if c)) / len(counts)


def main():
    filename1 = sys.argv[1]
    filename2 = sys.argv[2]
    uniq1 = open(os.path.basename(sys.argv[1]) + '.uniq', 'w')
    uniq2 = open(os.path.basename(sys.argv[2]) + '.uniq', 'w')
    paths = sys.argv[3]

    kh1 = Nodegraph(K, HASHTABLE_SIZE, N_HT)
    kh1.consume_seqfile(filename1)
    kh2 = Nodegraph(K, HASHTABLE_SIZE, N_HT)
    kh2.consume_seqfile(filename2)

    for record in iter_records(paths):
        present1 = frac_present(kh1, record.sequence) >= THRESHOLD
        present2 = frac_present(kh2, record.sequence) >= THRESHOLD

        if present1 and not present2:
            print('>%s\n%s' % (record.name, record.sequence), file=uniq1)
        elif present2 and not present1:
            print('>%s\n%s' % (record.name, record.sequence), file=uniq2)


if __name__ == '__main__':
    main()
