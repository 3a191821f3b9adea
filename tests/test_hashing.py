"""Hash-function bit-exactness tests.

Oracles: hand-computed values from the reference algorithms
(src/oxli/kmer_hash.cc) and cross-checks between the scalar Python
reference implementations and the batched jnp device code.
"""

import random

import numpy as np
import pytest

import khmer_tpu
from khmer_tpu.ops import hashing as H

import jax.numpy as jnp


def test_twobit_codec():
    assert H.encode_dna("ATCG").tolist() == [0, 1, 2, 3]
    assert H.encode_dna("atcg").tolist() == [0, 1, 2, 3]
    # cleaning: anything else -> A
    assert H.encode_dna("NXW-").tolist() == [0, 0, 0, 0]
    assert H.decode_dna([0, 1, 2, 3]) == "ATCG"


def test_forward_hash_basics():
    # A=0: AAAA...A == 0
    assert H.forward_hash_no_rc("A" * 10, 10) == 0
    # canonical = min(f, r)
    f = H.forward_hash_no_rc("GGGG", 4)
    # revcomp(GGGG) = CCCC
    r = H.forward_hash_no_rc("CCCC", 4)
    assert H.forward_hash("GGGG", 4) == min(f, r)


def test_hash_reverse_roundtrip():
    random.seed(42)
    for k in (4, 15, 21, 32):
        for _ in range(20):
            kmer = "".join(random.choice("ACGT") for _ in range(k))
            h = H.forward_hash_no_rc(kmer, k)
            assert H.reverse_hash(h, k) == kmer


def test_forward_hash_canonical_is_revcomp_invariant():
    random.seed(1)
    for k in (5, 20, 32):
        for _ in range(20):
            kmer = "".join(random.choice("ACGT") for _ in range(k))
            rc = H.reverse_complement(kmer)
            assert H.forward_hash(kmer, k) == H.forward_hash(rc, k)


def test_reverse_complement():
    assert H.reverse_complement("ACGT") == "ACGT"
    assert H.reverse_complement("AAAA") == "TTTT"
    assert H.reverse_complement("AGGT") == "ACCT"
    # IUPAC codes
    assert H.reverse_complement("N") == "N"
    assert H.reverse_complement("R") == "Y"


def test_murmur3_known_vectors():
    # MurmurHash3_x64_128 with seed 0 — spec test vectors
    h1, h2 = H._murmur3_x64_128(b"")
    assert h1 == 0 and h2 == 0
    # 'a' with seed 0 (public known value)
    h1, _ = H._murmur3_x64_128(b"a")
    assert h1 == 0x85555565F6597889
    h1, _ = H._murmur3_x64_128(b"Hello, world!")
    assert h1 == 0xF1512DD1D2D665DF


def test_murmur_canonical_revcomp_invariant():
    random.seed(7)
    for k in (5, 16, 20, 32):
        for _ in range(20):
            kmer = "".join(random.choice("ACGT") for _ in range(k))
            rc = H.reverse_complement(kmer)
            assert H.hash_murmur3(kmer) == H.hash_murmur3(rc)


def test_murmur_palindrome_special_case():
    # revcomp(ACGT) == ACGT: canonical must be h (not h^r == 0)
    kmer = "ACGT"
    assert H.reverse_complement(kmer) == kmer
    assert H.hash_murmur3(kmer) == H.hash_no_rc_murmur3(kmer)


@pytest.mark.parametrize("k", [4, 7, 15, 16, 17, 20, 31, 32])
def test_rolling_hash_windows_matches_scalar(k):
    random.seed(k)
    seq = "".join(random.choice("ACGT") for _ in range(3 * k + 17))
    codes = jnp.asarray(H.encode_dna(seq))[None, :]
    canon, f, r = H.rolling_hash_windows(codes, k)
    canon = np.asarray(canon)[0]
    f = np.asarray(f)[0]
    r = np.asarray(r)[0]
    for i in range(len(seq) - k + 1):
        c_ref, f_ref, r_ref = H._hash_scalar(seq[i:i + k], k)
        assert int(f[i]) == f_ref, (i, seq[i:i + k])
        assert int(r[i]) == r_ref
        assert int(canon[i]) == c_ref


@pytest.mark.parametrize("k", [4, 5, 8, 15, 16, 17, 24, 31, 32])
def test_murmur_hash_windows_matches_scalar(k):
    random.seed(100 + k)
    seq = "".join(random.choice("ACGT") for _ in range(2 * k + 13))
    codes = jnp.asarray(H.encode_dna(seq))[None, :]
    canon, h, r = H.murmur_hash_windows(codes, k)
    canon = np.asarray(canon)[0]
    for i in range(len(seq) - k + 1):
        assert int(canon[i]) == H._hash_murmur_scalar(seq[i:i + k])[0], \
            (i, seq[i:i + k])


def test_murmur_windows_palindromes():
    # include palindromic windows explicitly
    seq = "AACGTT"  # windows of k=4: AACG, ACGT (palindrome), CGTT
    k = 4
    codes = jnp.asarray(H.encode_dna(seq))[None, :]
    canon, _, _ = H.murmur_hash_windows(codes, k)
    for i in range(3):
        assert int(np.asarray(canon)[0, i]) == \
            H._hash_murmur_scalar(seq[i:i + k])[0]


def test_band_interval():
    lo, hi = H.compute_band_interval(4, 0)
    assert lo == 0
    lo3, hi3 = H.compute_band_interval(4, 3)
    assert hi3 == (2**64 - 1) // 4 * 4
    with pytest.raises(ValueError):
        H.compute_band_interval(4, 4)


def test_module_level_khmer_api():
    assert khmer_tpu.forward_hash("AAAA", 4) == 0
    with pytest.raises(ValueError):
        khmer_tpu.forward_hash("AAAA", 5)
    with pytest.raises(ValueError):
        khmer_tpu.forward_hash("A" * 33, 33)
    assert khmer_tpu.reverse_hash(0, 4) == "AAAA"
    assert khmer_tpu.reverse_complement("ACCA") == "TGGT"
