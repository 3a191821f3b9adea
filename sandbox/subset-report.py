#!/usr/bin/env python
"""Report partition count / orphan count / size distribution for each
.pmap subset file given on the command line.

Sandbox-tier equivalent of reference sandbox/subset-report.py:42-62.

% python sandbox/subset-report.py <file1.pmap> [<file2.pmap> ...]
"""

import sys

from _sandbox import *  # noqa: F401,F403

from khmer_tpu import Nodegraph
from khmer_tpu.core.partition import SubsetPartition

K = 32


def main():
    subset_filenames = sys.argv[1:]

    ht = Nodegraph(K, 1, 1)
    for filename in subset_filenames:
        print('--')
        print('partition map:', filename)
        subset = SubsetPartition.load(filename, ht)
        n_part, n_orphan = subset.count_partitions()
        print('num partitions:', n_part)
        print('num orphans:', n_orphan)

        dist, n_unassigned = subset.partition_size_distribution()
        for (size, count) in dist:
            print(size, count)
        print('%d unassigned tags' % n_unassigned)

        print('--')


if __name__ == '__main__':
    main()
