"""Sketch-semantics tests: batched device updates must be
sequential-equivalent to the reference storage algorithms (validated
against the pure-Python oracles in oracle.py, including adversarial
collision/ordering cases)."""

import random

import numpy as np
import pytest

from khmer_tpu import (Countgraph, Counttable, Nodegraph, Nodetable,
                       SmallCountgraph, SmallCounttable)

from .oracle import OracleBit, OracleByte, OracleNibble


def random_hashes(n, lo=0, hi=2**64 - 1, seed=0, dup_rate=0.5):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        if out and rng.random() < dup_rate:
            out.append(rng.choice(out))
        else:
            out.append(rng.randrange(lo, hi))
    return out


class TestByteStorage:
    def test_simple_counts(self):
        ct = Counttable(4, 1000, 2)
        ct.count("AAAA")
        ct.count("AAAA")
        assert ct.get("AAAA") == 2
        assert ct.get("TTTT") == 2  # revcomp canonical
        assert ct.get("CCCC") == 0

    def test_saturation_at_255(self):
        ct = Counttable(4, 1000, 2)
        for _ in range(300):
            ct.count("ACGG")
        assert ct.get("ACGG") == 255

    def test_bigcount(self):
        ct = Counttable(4, 1000, 2)
        ct.set_use_bigcount(True)
        for _ in range(300):
            ct.count("ACGG")
        assert ct.get("ACGG") == 300

    def test_bigcount_batch(self):
        ct = Counttable(4, 1000, 2)
        ct.set_use_bigcount(True)
        h = ct.hash("ACGG")
        ct._commit_hashes(np.full(1000, h, dtype=np.uint64))
        assert ct.get("ACGG") == 1000
        ct._commit_hashes(np.full(200, h, dtype=np.uint64))
        assert ct.get("ACGG") == 1200

    def test_bigcount_cap(self):
        ct = Counttable(4, 1000, 2)
        ct.set_use_bigcount(True)
        h = ct.hash("ACGG")
        ct._commit_hashes(np.full(70000, h, dtype=np.uint64))
        assert ct.get("ACGG") == 65535

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_stress_vs_oracle(self, seed):
        primes = (97, 89, 83)
        ct = Counttable(4, 1, 0, primes=primes)
        oracle = OracleByte(primes, use_bigcount=True)
        ct.set_use_bigcount(True)
        hashes = random_hashes(500, seed=seed, dup_rate=0.6)
        # commit in several uneven batches to stress batch boundaries
        rng = random.Random(seed + 100)
        i = 0
        while i < len(hashes):
            n = rng.randrange(1, 80)
            batch = hashes[i:i + n]
            ct._commit_hashes(np.array(batch, dtype=np.uint64))
            for h in batch:
                oracle.add(h)
            i += n
        for h in set(hashes):
            assert ct.get(h) == oracle.get(h), h
        assert ct.n_occupied() == oracle.occupied
        assert ct.n_unique_kmers() == oracle.n_unique
        for t in range(len(primes)):
            np.testing.assert_array_equal(ct.get_raw_tables()[t],
                                          oracle.table_array(t))
        assert ct._bigcounts == oracle.bigcounts

    def test_within_batch_bin_collision_ordering(self):
        # two distinct hashes sharing a bin in table 0: only the first
        # (in batch order) gets n_unique credit through that table
        p = 97
        ct = Counttable(4, 1, 0, primes=(p,))
        oracle = OracleByte((p,))
        a, b = 5, 5 + p  # same bin
        ct._commit_hashes(np.array([a, b], dtype=np.uint64))
        oracle.add(a)
        oracle.add(b)
        assert ct.n_unique_kmers() == oracle.n_unique == 1
        assert ct.get(a) == oracle.get(a) == 2


class TestNibbleStorage:
    def test_saturates_at_15(self):
        ct = SmallCounttable(4, 1000, 2)
        for _ in range(20):
            ct.count("ACGG")
        assert ct.get("ACGG") == 15

    @pytest.mark.parametrize("seed", [0, 1])
    def test_stress_vs_oracle(self, seed):
        primes = (101, 103)
        ct = SmallCounttable(4, 1, 0, primes=primes)
        oracle = OracleNibble(primes)
        hashes = random_hashes(400, seed=seed, dup_rate=0.5)
        rng = random.Random(seed)
        i = 0
        while i < len(hashes):
            n = rng.randrange(1, 60)
            batch = hashes[i:i + n]
            ct._commit_hashes(np.array(batch, dtype=np.uint64))
            for h in batch:
                oracle.add(h)
            i += n
        for h in set(hashes):
            assert ct.get(h) == oracle.get(h), h
        assert ct.n_unique_kmers() == oracle.n_unique
        assert ct.n_occupied() == oracle.occupied
        for t in range(len(primes)):
            np.testing.assert_array_equal(ct.get_raw_tables()[t],
                                          oracle.table_array(t))


class TestBitStorage:
    def test_membership(self):
        nt = Nodetable(4, 1000, 2)
        nt.count("ACGG")
        assert nt.get("ACGG") == 1
        assert nt.get("CCTA") == 0

    @pytest.mark.parametrize("seed", [0, 1])
    def test_stress_vs_oracle(self, seed):
        primes = (127, 131)
        nt = Nodetable(4, 1, 0, primes=primes)
        oracle = OracleBit(primes)
        hashes = random_hashes(400, seed=seed, dup_rate=0.5)
        rng = random.Random(seed + 5)
        i = 0
        while i < len(hashes):
            n = rng.randrange(1, 60)
            batch = hashes[i:i + n]
            nt._commit_hashes(np.array(batch, dtype=np.uint64))
            for h in batch:
                oracle.add(h)
            i += n
        for h in set(hashes):
            assert nt.get(h) == oracle.get(h), h
        assert nt.n_unique_kmers() == oracle.n_unique
        assert nt.n_occupied() == oracle.occupied
        for t in range(len(primes)):
            np.testing.assert_array_equal(nt.get_raw_tables()[t],
                                          oracle.table_array(t))


class TestSequenceOps:
    def test_consume(self):
        ct = Counttable(4, 4 ** 6, 2)
        n = ct.consume("ATGGATGG")
        assert n == 5
        assert ct.get("ATGG") == 2

    def test_consume_short_raises(self):
        ct = Counttable(6, 1000, 2)
        with pytest.raises(ValueError):
            ct.consume("AAA")

    def test_get_kmer_counts(self):
        ct = Counttable(4, 4 ** 6, 2)
        ct.consume("ATGGATGG")
        counts = ct.get_kmer_counts("ATGGATGG")
        assert counts == [2, 1, 1, 1, 2]

    def test_median_count(self):
        ct = Counttable(4, 4 ** 6, 2)
        ct.consume("ATGGATGG")
        med, avg, std = ct.get_median_count("ATGGATGG")
        assert med == 1
        assert avg == pytest.approx(1.4)

    def test_median_at_least(self):
        ct = Counttable(4, 4 ** 6, 2)
        for _ in range(3):
            ct.consume("ATGGATGG")
        assert ct.median_at_least("ATGGATGG", 3)
        assert not ct.median_at_least("ATGGATGG", 4)

    def test_trim_on_abundance(self):
        ct = Counttable(4, 4 ** 6, 2)
        ct.consume("ATGGAC")
        trimmed, pos = ct.trim_on_abundance("ATGGACTT", 1)
        assert trimmed == "ATGGAC"
        assert pos == 6

    def test_hash_sizes_and_ksize(self):
        ct = Counttable(7, 1000, 3)
        assert ct.ksize() == 7
        assert len(ct.hashsizes()) == 3
        assert all(p <= 1000 for p in ct.hashsizes())

    def test_2bit_vs_murmur_distinct(self):
        cg = Countgraph(4, 1000, 2)
        ct = Counttable(4, 1000, 2)
        assert cg.hash("ATGG") != ct.hash("ATGG")
        # countgraph hash is reversible
        assert cg.reverse_hash(cg.hash("AAAT")) in ("AAAT", "ATTT")


class TestGraphBasics:
    def test_countgraph_counts(self):
        cg = Countgraph(5, 4 ** 8, 4)
        cg.consume("ATGGAGAGAC")
        assert cg.get("ATGGA") == 1
        assert cg.get("TCTCT") == 1  # revcomp present

    def test_nodegraph_membership(self):
        ng = Nodegraph(5, 4 ** 8, 4)
        ng.consume("ATGGAGAGAC")
        assert ng.get("ATGGA") == 1
        assert ng.get("AAAAA") == 0

    def test_nodegraph_update_from(self):
        a = Nodegraph(5, 1000, 2)
        b = Nodegraph(5, 1000, 2)
        b.count("AAAAA")
        assert a.get("AAAAA") == 0
        a.update(b)
        assert a.get("AAAAA") == 1

    def test_smallcountgraph(self):
        sg = SmallCountgraph(5, 4 ** 8, 2)
        sg.consume("ATGGAGAGAC")
        assert sg.get("ATGGA") == 1
