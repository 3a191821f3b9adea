#!/usr/bin/env python
"""Collision-free counting: one table sized past the k-mer space.

khmer_tpu analog of the reference examples/python-api/exact-counting.py
— with 4**k + 10 buckets and a single table, counts are exact and the
reversible 2-bit hash maps bins back to k-mer strings.
"""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', '..'))

import khmer_tpu

ksize = 6
nkmers = 4**ksize
tablesize = nkmers + 10

cg = khmer_tpu.Countgraph(ksize, tablesize, 1)
print('Created a countgraph with', cg.hashsizes(), 'buckets')

cg.count('ATGGCA')
cg.count('ATGGCA')
cg.count('ACATGG')
cg.count('AAAAAA')
cg.count('TTTTTT')  # this will be counted towards AAAAAA (revcomp)

for i in range(nkmers):
    if cg.get(i):
        print(cg.reverse_hash(i), cg.get(i))
