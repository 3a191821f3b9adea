"""Read parser edge cases (reference tests/test_read_parsers.py).

Covers the Read record contract (cleaned_seq semantics), truncated /
empty / compressed inputs, pair-mating rules, and the broken-paired
reader, against the reference's golden fixtures.
"""

import os

import pytest

from khmer_tpu.io.fastx import FastxParser
from khmer_tpu.io.pairing import (broken_paired_reader, check_is_pair,
                                  check_is_left, check_is_right)

DATA = "/root/reference/tests/test-data"


def d(name):
    return os.path.join(DATA, name)


class Rec:
    def __init__(self, name, sequence, quality=None):
        self.name = name
        self.sequence = sequence
        self.quality = quality


# -- record contract -------------------------------------------------------

def test_read_count_fq():
    assert sum(1 for _ in FastxParser(d("100-reads.fq.gz"))) == 100


def test_read_count_fa():
    assert sum(1 for _ in FastxParser(d("test-abund-read-2.fa"))) == 1001


def test_cleaned_seq_uppercase_and_n_to_a():
    recs = list(FastxParser(d("test-abund-read-3.fa")))
    for r in recs:
        assert r.cleaned_seq == r.sequence.upper().replace("N", "A")


def test_quality_preserved_fq():
    r = next(iter(FastxParser(d("100-reads.fq.gz"))))
    assert r.quality is not None
    assert len(r.quality) == len(r.sequence)


def test_fasta_has_no_quality():
    r = next(iter(FastxParser(d("test-abund-read-2.fa"))))
    assert getattr(r, "quality", None) in (None, "")


def test_names_unparsed():
    names = [r.name for r in FastxParser(d("paired.fq"))]
    assert any(n.endswith("/1") for n in names)
    assert any(n.endswith("/2") for n in names)


# -- compressed / damaged inputs ------------------------------------------

def test_gzip_decompression():
    n = sum(1 for _ in FastxParser(d("100-reads.fq.gz")))
    assert n == 100


def test_bzip2_decompression():
    n = sum(1 for _ in FastxParser(d("100-reads.fq.bz2")))
    assert n == 100


def test_gzip_truncated_raises():
    with pytest.raises((OSError, ValueError, EOFError)):
        list(FastxParser(d("100-reads.fq.truncated.gz")))


def test_bzip2_truncated_raises():
    with pytest.raises((OSError, ValueError, EOFError)):
        list(FastxParser(d("100-reads.fq.truncated.bz2")))


def test_plain_truncated_fastq_raises():
    with pytest.raises((OSError, ValueError)):
        list(FastxParser(d("truncated.fq")))


def test_empty_file_yields_nothing():
    assert list(FastxParser(d("empty-file"))) == []


def test_empty_fasta():
    assert list(FastxParser(d("test-empty.fa"))) == []


# -- pairing rules ---------------------------------------------------------

def test_check_is_pair_slash_convention():
    a = Rec("read/1", "A" * 30)
    b = Rec("read/2", "A" * 30)
    assert check_is_pair(a, b)
    assert check_is_left(a.name) and not check_is_right(a.name)
    assert check_is_right(b.name) and not check_is_left(b.name)


def test_check_is_pair_casava18():
    a = Rec("read 1:N:0:TAGGCC", "A" * 30)
    b = Rec("read 2:N:0:TAGGCC", "A" * 30)
    assert check_is_pair(a, b)
    assert check_is_left(a.name)
    assert check_is_right(b.name)


def test_check_is_pair_mismatch():
    a = Rec("readA/1", "A" * 30)
    b = Rec("readB/2", "A" * 30)
    assert not check_is_pair(a, b)


def test_broken_paired_reader_counts():
    reader = iter(list(FastxParser(d("paired-mixed.fa"))))
    pairs = 0
    singles = 0
    for _n, is_pair, r1, r2 in broken_paired_reader(reader):
        if is_pair:
            pairs += 1
            assert check_is_pair(r1, r2)
        else:
            singles += 1
            assert r2 is None
    assert pairs > 0 and singles > 0


def test_broken_paired_reader_force_single():
    reader = iter(list(FastxParser(d("paired.fq"))))
    out = list(broken_paired_reader(reader, force_single=True))
    assert all(not is_pair for _, is_pair, _, _ in out)


def test_broken_paired_reader_require_paired():
    reader = iter(list(FastxParser(d("paired.fq"))))
    out = list(broken_paired_reader(reader, require_paired=True))
    assert all(is_pair for _, is_pair, _, _ in out)


def test_broken_paired_reader_min_length_filter():
    reader = iter(list(FastxParser(d("paired-mixed.fa"))))
    for _n, is_pair, r1, r2 in broken_paired_reader(reader,
                                                    min_length=40):
        for r in (r1, r2):
            if r is not None:
                assert len(r.sequence) >= 40
