#!/usr/bin/env python
"""Load a sequence file into a Count-Min sketch and query k-mers.

khmer_tpu analog of the reference examples/python-api/consume.py: the
file streams through the fused device pipeline (hash + dedup + update
in one jit per chunk) instead of reader threads.

Usage: consume.py <reads.fa/fq[.gz]>
"""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', '..'))

import khmer_tpu

ksize = 21
target_table_size = 5e8
num_tables = 4

counts = khmer_tpu.Counttable(ksize, target_table_size, num_tables)
nseqs, nkmers = counts.consume_seqfile(sys.argv[1])
print('Loaded', nseqs, 'sequences and', nkmers, 'k-mers from', sys.argv[1])

print('The kmer "CAGCGCCGTGTTGTTGCAATT" appears',
      counts.get('CAGCGCCGTGTTGTTGCAATT'), 'times in the data')
print('The kmer "GATTACAGATTACAGATTACA" appears',
      counts.get('GATTACAGATTACAGATTACA'), 'times in the data')
