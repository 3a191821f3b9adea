"""Masked / banded bulk-consume battery.

Oracles from the reference's tests/test_counttable.py:83-196 (the
seq-a/seq-b overlap diagrams): only k-mers absent from (or below
threshold in) the mask are loaded; consume_masked inverts the rule;
banding composes with masking.
"""

import random

import pytest

import khmer_tpu as khmer

from .script_utils import get_test_data

K = 13
IN_MASK = "GATTTGAGAAAAA"
NEW1, NEW2, NEW3 = "ATTTGAGAAAAAA", "TTTGAGAAAAAAG", "TTGAGAAAAAAGT"


def test_consume_with_mask_skips_masked_kmers():
    mask = khmer.Counttable(K, 1e3, 4)
    mask.consume_seqfile(get_test_data("seq-a.fa"))
    ct = khmer.Counttable(K, 1e3, 4)
    nr, nk = ct.consume_seqfile_with_mask(get_test_data("seq-b.fa"), mask)
    assert nr == 1
    assert nk == 3
    assert ct.get(IN_MASK) == 0
    assert ct.get(NEW1) == 1
    assert ct.get(NEW2) == 1
    assert ct.get(NEW3) == 1


def test_consume_banding_with_mask():
    mask = khmer.Counttable(K, 1e3, 4)
    mask.consume_seqfile(get_test_data("seq-a.fa"))
    ct = khmer.Counttable(K, 1e3, 4)
    nr, nk = ct.consume_seqfile_banding_with_mask(
        get_test_data("seq-b.fa"), 4, 1, mask)
    assert nr == 1
    assert nk == 1
    assert ct.get(IN_MASK) == 0    # in the mask
    assert ct.get(NEW1) == 0       # out of band
    assert ct.get(NEW2) == 0       # out of band
    assert ct.get(NEW3) == 1       # band 1/4


def test_consume_with_mask_threshold():
    mask = khmer.Counttable(K, 1e3, 4)
    for _ in range(3):
        mask.consume("TAGATCTGCTTGAAACAAGTGGATTTGAGAAAAA")
    for _ in range(2):
        mask.consume("TAGATCTGCTTGAAACAAGTGGATTTGAGAAAAAAGT")
    ct = khmer.Counttable(K, 1e3, 4)
    nr, nk = ct.consume_seqfile_with_mask(get_test_data("seq-b.fa"),
                                          mask, 3)
    assert nr == 1
    assert nk == 3
    assert ct.get(IN_MASK) == 0
    assert ct.get(NEW1) == 1
    assert ct.get(NEW2) == 1
    assert ct.get(NEW3) == 1


def test_consume_with_mask_complement():
    mask = khmer.Nodetable(K, 1e3, 4)
    mask.consume("TGCTTGAAACAAGTG")
    ct = khmer.Counttable(K, 1e3, 4)
    ct.consume_seqfile_with_mask(get_test_data("seq-b.fa"), mask,
                                 threshold=1, consume_masked=True)
    assert ct.get_kmer_counts("TGCTTGAAACAAGTG") == [1, 1, 1]
    assert ct.get_kmer_counts("GAAACAAGTGGATTT") == [0, 0, 0]


def test_banding_partitions_all_kmers():
    # the four bands must tile the k-mer set exactly (banding
    # equivalence: union of banded loads == unbanded load)
    full = khmer.Counttable(K, 1e4, 4)
    full.consume_seqfile(get_test_data("seq-b.fa"))
    banded = khmer.Counttable(K, 1e4, 4)
    total_kmers = 0
    for band in range(4):
        _, nk = banded.consume_seqfile_banding(get_test_data("seq-b.fa"),
                                               4, band)
        total_kmers += nk
    assert banded.get_raw_tables()[0].tobytes() == \
        full.get_raw_tables()[0].tobytes()


@pytest.mark.parametrize("sketchtype", [
    khmer.Nodegraph, khmer.Countgraph, khmer.SmallCountgraph,
    khmer.Nodetable, khmer.Counttable, khmer.SmallCounttable,
    khmer.CyclicCounttable,
])
def test_init_with_explicit_primes(sketchtype):
    rng = random.Random(42)
    primes = khmer.get_n_primes_near_x(4, rng.randint(1000, 2000))
    sketch = sketchtype(31, 1, 1, primes=primes)
    assert sketch.hashsizes() == primes
