#!/usr/bin/env python
"""Report partition count / orphan count / size distribution for each
.pmap subset file given on the command line.

Behavioral peer of the reference's subset reporter (reference
sandbox/subset-report.py:42-62), printing the same '--'-framed blocks
per file.

usage: python sandbox/subset-report.py <file1.pmap> [<file2.pmap> ...]
"""

import argparse

from _sandbox import *  # noqa: F401,F403

from khmer_tpu import Nodegraph
from khmer_tpu.core.partition import SubsetPartition


def describe(pmap_path, shell):
    print('--')
    print('partition map:', pmap_path)
    subset = SubsetPartition.load(pmap_path, shell)
    n_partitions, n_orphaned = subset.count_partitions()
    print('num partitions:', n_partitions)
    print('num orphans:', n_orphaned)
    histogram, n_unassigned = subset.partition_size_distribution()
    for size, count in histogram:
        print(size, count)
    print('%d unassigned tags' % n_unassigned)
    print('--')


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('pmaps', nargs='+')
    shell = Nodegraph(32, 1, 1)
    for path in ap.parse_args().pmaps:
        describe(path, shell)


if __name__ == '__main__':
    main()
