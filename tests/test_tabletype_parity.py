"""API parity tests across all table types (modeled on the reference
tests/test_tabletype.py table fixtures)."""

import pytest

from khmer_tpu import (Countgraph, Counttable, CyclicCounttable,
                       Nodegraph, Nodetable, QFCounttable,
                       SmallCountgraph, SmallCounttable)

ALL_TYPES = [Counttable, SmallCounttable, Nodetable, Countgraph,
             SmallCountgraph, Nodegraph]
COUNTING_TYPES = [Counttable, SmallCounttable, Countgraph,
                  SmallCountgraph]


@pytest.mark.parametrize("cls", ALL_TYPES)
def test_count_and_get(cls):
    tt = cls(6, 1e5, 4)
    tt.count("ATGGCA")
    assert tt.get("ATGGCA") == 1
    # revcomp canonical
    assert tt.get("TGCCAT") == 1
    assert tt.get("GGGGGG") == 0


@pytest.mark.parametrize("cls", ALL_TYPES)
def test_hash_consistency(cls):
    tt = cls(6, 1e5, 4)
    h = tt.hash("ATGGCA")
    tt.count(h)
    assert tt.get("ATGGCA") == 1


@pytest.mark.parametrize("cls", ALL_TYPES)
def test_wrong_ksize_raises(cls):
    tt = cls(6, 1e5, 4)
    with pytest.raises(ValueError):
        tt.hash("ATG")
    with pytest.raises(ValueError):
        tt.get("ATG")


@pytest.mark.parametrize("cls", COUNTING_TYPES)
def test_counting_goes_up(cls):
    tt = cls(6, 1e5, 4)
    for i in range(5):
        tt.count("ATGGCA")
    assert tt.get("ATGGCA") == 5


@pytest.mark.parametrize("cls", ALL_TYPES)
def test_get_kmers(cls):
    tt = cls(4, 1e4, 2)
    assert tt.get_kmers("ATGGCA") == ['ATGG', 'TGGC', 'GGCA']


@pytest.mark.parametrize("cls", [Countgraph, SmallCountgraph, Nodegraph])
def test_reverse_hash(cls):
    tt = cls(6, 1e5, 4)
    h = tt.hash("ATGGCA")
    assert tt.reverse_hash(h) in ("ATGGCA", "TGCCAT")


@pytest.mark.parametrize("cls", [Counttable, SmallCounttable, Nodetable])
def test_murmur_no_reverse_hash(cls):
    tt = cls(6, 1e5, 4)
    with pytest.raises(ValueError):
        tt.reverse_hash(17)


def test_cyclic_counttable():
    ct = CyclicCounttable(6, 1e5, 4)
    ct.count("ATGGCA")
    assert ct.get("ATGGCA") == 1
    assert ct.get("TGCCAT") == 1  # h + r canonical is rc-invariant
    assert ct.get("CCCCCC") == 0
    # consume a sequence
    n = ct.consume("ATGGCAAT")
    assert n == 3
    assert ct.get("ATGGCA") == 2


def test_qf_counttable():
    qf = QFCounttable(6, 1024)
    qf.count("ATGGCA")
    qf.count("ATGGCA")
    assert qf.get("ATGGCA") == 2
    assert qf.get("GGGGGG") == 0
    with pytest.raises(ValueError):
        QFCounttable(6, 1000)  # not a power of two


def test_qf_consume():
    qf = QFCounttable(6, 1024)
    n = qf.consume("ATGGCAAT")
    assert n == 3


def test_qf_save_load_roundtrip(tmp_path):
    """Reference tests/test_qfstorage.py:9-28: counts survive a
    save/load round trip of the SAVED_QFCOUNT file."""
    import random

    rng = random.Random(1)
    qf = QFCounttable(20, 1024 * 4)
    kmers = ["".join(rng.choice("ACGT") for _ in range(20))
             for _ in range(400)]
    for kmer in kmers:
        qf.add(kmer)

    fname = str(tmp_path / "zzz.qf")
    qf.save(fname)

    qf2 = QFCounttable.load(fname)
    assert qf.ksize() == qf2.ksize()
    for kmer in kmers:
        assert qf.get(kmer) == qf2.get(kmer)
    assert qf2.n_unique_kmers() == qf.n_unique_kmers()

    # header carries the OXLI signature + QFCOUNT type byte
    with open(fname, "rb") as fp:
        head = fp.read(6)
    assert head[:4] == b"OXLI"
    assert head[5] == 8  # SAVED_QFCOUNT


def test_qf_load_rejects_wrong_type(tmp_path):
    import pytest

    from khmer_tpu import Countgraph

    cg = Countgraph(6, 1000, 2)
    fname = str(tmp_path / "a.ct")
    cg.save(fname)
    with pytest.raises(OSError):
        QFCounttable.load(fname)


def test_qf_xnslots_matches_gqf(tmp_path):
    """gqf qf_init: xnslots = floor(nslots + 10*sqrt(nslots)) — the
    sqrt must not be truncated before the multiply (2048 -> 2500)."""
    from khmer_tpu.core.qf import QuotientFilter

    assert QuotientFilter(2048).xnslots == 2500
    assert QuotientFilter(1024).xnslots == 1344


def test_qf_load_rejects_foreign_slot_layout(tmp_path):
    """Headers declaring a non-8-bit slot layout (other gqf compile
    configs) must be rejected, not misparsed."""
    qf = QFCounttable(20, 1024)
    qf.count("A" * 20)
    fname = str(tmp_path / "ref.qf")
    qf.save(fname)
    with open(fname, "rb") as fp:
        data = bytearray(fp.read())
    # bits_per_slot metadata word (6th u64 after the 7-byte header)
    import struct
    struct.pack_into("<Q", data, 7 + 5 * 8, 16)
    bad = str(tmp_path / "refblock.qf")
    with open(bad, "wb") as fp:
        fp.write(bytes(data))
    with pytest.raises(OSError, match="bits_per_slot"):
        QFCounttable.load(bad)


def test_qf_load_truncated_raises_oserror(tmp_path):
    qf = QFCounttable(20, 1024)
    qf.count("A" * 20)
    fname = str(tmp_path / "t.qf")
    qf.save(fname)
    with open(fname, "rb") as fp:
        data = fp.read()
    short = str(tmp_path / "short.qf")
    with open(short, "wb") as fp:
        fp.write(data[:30])  # cuts inside the metadata words
    with pytest.raises(OSError, match="end of k-mer count file"):
        QFCounttable.load(short)
