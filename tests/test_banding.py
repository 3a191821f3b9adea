"""Hash-space banding equivalence (reference tests/test_banding.py) —
the correctness model for hash-range sharding: B banded counttables
must sum to the unbanded counts (modulo Bloom false positives)."""

import pytest

from khmer_tpu import Counttable
from khmer_tpu.io.fastx import FastxParser

from .script_utils import get_test_data


@pytest.mark.parametrize('ksize,memory,epsilon,numbands', [
    (21, 5e6, 1, 2),
    (21, 5e6, 1, 4),
    (21, 5e6, 1, 8),
])
def test_banding_in_memory(ksize, memory, epsilon, numbands):
    infile = get_test_data('banding-reads.fq')

    ct_normal = Counttable(ksize, memory / 4, 4)
    ct_normal.consume_seqfile(infile)

    ct_banded = list()
    for band in range(numbands):
        ct = Counttable(ksize, memory / 4 / numbands, 4)
        ct.consume_seqfile_banding(infile, numbands, band)
        ct_banded.append(ct)

    for n, record in enumerate(FastxParser(infile)):
        if not (n > 0 and n % 100 == 0):
            continue
        for kmer in ct_normal.get_kmers(record.sequence):
            abund_normal = ct_normal.get(kmer)
            abunds_banded = [ct.get(kmer) for ct in ct_banded]
            assert abs(sum(abunds_banded) - abund_normal) <= epsilon

            nonzeros = [a for a in abunds_banded if a > 0]
            # a k-mer's hash lives in exactly one band
            assert len(nonzeros) <= 2
            if len(nonzeros) > 1:
                assert min(nonzeros) == 1
