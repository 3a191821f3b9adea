#!/usr/bin/env python
"""Count only k-mers absent from a mask (Bloom filter).

khmer_tpu analog of the reference examples/python-api/mask.py: count
dataset d2 while masking out any k-mer already present in d1.
"""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', '..'))

import khmer_tpu

d1 = "ATGTACGGGCATTACGATTACCGATGTAG"
d2 = "ATGACCAAACTCATTACGATTAGATATAG"

ksize = 5
target_table_size = 5e5
num_tables = 4

bf = khmer_tpu.Nodetable(ksize, target_table_size, num_tables)
bf.consume(d1)

cms = khmer_tpu.Counttable(ksize, target_table_size, num_tables)
for kmer in cms.get_kmers(d2):
    if bf.get(kmer) == 0:
        cms.consume(kmer)

assert cms.get('CATTA') == 0   # shared k-mer: masked
assert bf.get('CATTA') > 0
assert cms.get('ATGTA') == 0
assert bf.get('ATGTA') > 0
assert cms.get('TATAG') > 0    # unique to d2: counted
assert bf.get('TATAG') == 0
print("mask demo OK")
