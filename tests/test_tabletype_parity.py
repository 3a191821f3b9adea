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
