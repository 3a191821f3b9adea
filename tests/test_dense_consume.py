"""Dense consume path: host-hashed k-mer streams, bit-identical to the
windowed flat path.

The dense pipeline (pipeline.DenseHasher + make_dense_consume) hashes
on the host and ships only real k-mers to the device, so no scatter
slot is spent on read-boundary or padding windows (the r04 throughput
plateau). These tests pin:
  * hash parity: native hg_hash_dense / hg_hash_dense_reads == numpy
    fallback == scalar oracles, across chunk splits;
  * end-to-end parity: consume_seqfile(dense) == consume_seqfile(flat)
    for every storage layout — tables, n_unique, n_consumed all equal
    (stream order is preserved, so order-dependent statistics match);
  * tail/chunking edge cases (reads straddling pack chunks, short
    reads, empty input).

reference: src/oxli/hashtable.cc:125-274 (consume_seqfile),
src/oxli/kmer_hash.cc:65-208 (hash families).
"""

import os

import numpy as np
import pytest

from khmer_tpu.core import hostengine, pipeline
from khmer_tpu.ops import hashing as H


class Rec:
    def __init__(self, seq):
        self.cleaned_seq = seq


def _reads(seed, n=200, lo=10, hi=250):
    rng = np.random.default_rng(seed)
    return ["".join(rng.choice(list("ACGT"), size=int(L)))
            for L in rng.integers(lo, hi, n)]


def _scalar_oracle(reads, k, family):
    fn = (lambda s: H.forward_hash(s, k)) if family == "twobit" \
        else H.hash_murmur3
    return np.array([fn(s[i:i + k]) for s in reads if len(s) >= k
                     for i in range(len(s) - k + 1)], np.uint64)


@pytest.mark.parametrize("family", ["twobit", "murmur"])
@pytest.mark.parametrize("pack_chunk", [1 << 12, 1 << 16])
def test_dense_hash_parity(family, pack_chunk):
    k = 20
    reads = _reads(0)
    packer = pipeline.FlatPacker(k, chunk=pack_chunk)
    chunks = []
    for s in reads:
        chunks.extend(packer.add(s))
    tail = packer.flush()
    if tail:
        chunks.append(tail)

    dense = []
    for codes, starts, nfill in chunks:
        d_np = pipeline._dense_numpy(codes, starts, nfill, k, family)
        d_nat = hostengine.hash_dense(codes, starts, nfill, k, family)
        if d_nat is not None:
            assert np.array_equal(d_nat, d_np)
        dense.append(d_np)
    dense = np.concatenate(dense) if dense else np.zeros(0, np.uint64)
    assert np.array_equal(dense, _scalar_oracle(reads, k, family))


@pytest.mark.parametrize("family", ["twobit", "murmur"])
def test_dense_hasher_stream_order(family):
    k = 13
    reads = _reads(3, n=150, lo=5, hi=120)
    hasher = pipeline.DenseHasher(k, family, chunk=1024,
                                  pack_chunk=4096)
    got = []
    for s in reads:
        for arr, n in hasher.add(s):
            assert n == len(arr) == 1024
            got.append(arr[:n])
    for arr, n in hasher.flush():
        assert n <= len(arr)
        got.append(arr[:n])
    got = np.concatenate(got) if got else np.zeros(0, np.uint64)
    assert np.array_equal(got, _scalar_oracle(reads, k, family))


@pytest.mark.skipif(not hostengine.available(),
                    reason="native host library unavailable")
@pytest.mark.parametrize("family", ["twobit", "murmur"])
def test_hash_dense_reads_block(family):
    """Block entry (one C call per parser block) matches per-read."""
    k = 17
    reads = _reads(5, n=80, lo=8, hi=90)
    codes = np.concatenate([H.encode_dna(s) for s in reads])
    lens = np.array([len(s) for s in reads], np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    got = hostengine.hash_dense_reads(codes, offs, lens, k, family)
    assert np.array_equal(got, _scalar_oracle(reads, k, family))


def _build(layout, k=20, size=1e5):
    if layout == "blocked":
        from khmer_tpu.core.blocked import BlockedCountgraph

        return BlockedCountgraph(k, size, 4)
    if layout == "byte":
        from khmer_tpu.core.sketch import Countgraph

        return Countgraph(k, size, 4)
    if layout == "bit":
        from khmer_tpu.core.sketch import Nodegraph

        return Nodegraph(k, size, 4)
    if layout == "nibble":
        from khmer_tpu.core.sketch import SmallCountgraph

        return SmallCountgraph(k, size, 4)
    from khmer_tpu.core.sketch import Counttable

    return Counttable(k, size, 4)


@pytest.mark.parametrize("layout", ["blocked", "byte", "bit", "nibble",
                                    "murmur"])
def test_dense_vs_flat_consume(layout):
    recs = [Rec(s) for s in _reads(1, n=300, lo=15, hi=260)]
    os.environ["KHMER_TPU_NO_DENSE"] = "1"
    try:
        g1 = _build(layout)
        r1 = pipeline.consume_seqfile(g1, recs)
    finally:
        del os.environ["KHMER_TPU_NO_DENSE"]
    g2 = _build(layout)
    r2 = pipeline.consume_seqfile(g2, recs)
    assert r1 == r2
    assert int(g1._n_unique) == int(g2._n_unique)
    for t1, t2 in zip(g1.tables, g2.tables):
        assert np.array_equal(np.asarray(t1), np.asarray(t2))


def test_dense_vs_flat_consume_file():
    """Whole-file parity through the native parser block path."""
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "25k.fq.gz")
    os.environ["KHMER_TPU_NO_DENSE"] = "1"
    try:
        g1 = _build("byte", size=2e5)
        r1 = pipeline.consume_seqfile(g1, path)
    finally:
        del os.environ["KHMER_TPU_NO_DENSE"]
    g2 = _build("byte", size=2e5)
    r2 = pipeline.consume_seqfile(g2, path)
    assert r1 == r2 == (25000, 1248896)
    assert int(g1._n_unique) == int(g2._n_unique)
    for t1, t2 in zip(g1.tables, g2.tables):
        assert np.array_equal(np.asarray(t1), np.asarray(t2))


def test_dense_bigcount_parity():
    """Saturation + bigcount bookkeeping survives the dense path."""
    from khmer_tpu.core.sketch import Countgraph

    reads = ["ACGTACGTACGTACGTACGTACGT"] * 300 + _reads(7, n=50)
    recs = [Rec(s) for s in reads]
    os.environ["KHMER_TPU_NO_DENSE"] = "1"
    try:
        g1 = Countgraph(20, 1e5, 4)
        g1.set_use_bigcount(True)
        pipeline.consume_seqfile(g1, recs)
    finally:
        del os.environ["KHMER_TPU_NO_DENSE"]
    g2 = Countgraph(20, 1e5, 4)
    g2.set_use_bigcount(True)
    pipeline.consume_seqfile(g2, recs)
    assert g1._bigcounts == g2._bigcounts
    # the 20-mer recurs at offsets 0 and 4 of each 24bp repeat read:
    # 600 total — deep in bigcount territory, equal through both paths
    assert g1.get("ACGTACGTACGTACGTACGT") == \
        g2.get("ACGTACGTACGTACGTACGT") == 600


def test_dense_tail_size_ladder():
    assert pipeline._dense_tail_size(10, 1 << 20) == 4096
    assert pipeline._dense_tail_size(4097, 1 << 20) == 4608
    assert pipeline._dense_tail_size(5121, 1 << 20) == 5632
    assert pipeline._dense_tail_size(8000, 1 << 20) == 8192
    assert pipeline._dense_tail_size(200320, 1 << 20) == 212992
    assert pipeline._dense_tail_size(1 << 21, 1 << 20) == 1 << 20
    # quantization waste is bounded: worst step ratio is 9/8
    for n in range(4097, 1 << 16, 997):
        s = pipeline._dense_tail_size(n, 1 << 20)
        assert n <= s <= max(n * 9 // 8 + 8, 4096)


def test_dense_empty_and_short():
    g = _build("byte")
    assert pipeline.consume_seqfile(g, [Rec("ACGT"), Rec("")]) == (2, 0)
    assert int(g._n_unique) == 0


@pytest.mark.parametrize("k", [4, 31, 32])
@pytest.mark.parametrize("family", ["twobit", "murmur"])
def test_dense_hash_k_edges(k, family):
    """k edge cases: tiny k, and k=32 where the 2-bit hash fills all
    64 bits (the C Roller's full-mask branch)."""
    reads = _reads(11, n=60, lo=3, hi=90)
    hasher = pipeline.DenseHasher(k, family, chunk=512, pack_chunk=2048)
    got = []
    for s in reads:
        got.extend(arr[:n] for arr, n in hasher.add(s))
    got.extend(arr[:n] for arr, n in hasher.flush())
    got = np.concatenate(got) if got else np.zeros(0, np.uint64)
    assert np.array_equal(got, _scalar_oracle(reads, k, family))
