"""Nodegraph behavioral battery.

Mirrors the behavioral contract of the reference's
tests/test_nodegraph.py (Bloom presence semantics, update_from,
tag/stoptag management + IO error paths, degree/neighbor queries,
linear-path traversal, occupancy parity with Countgraph) against this
repo's batched engine.
"""

import gzip
import os

import numpy as np
import pytest

import khmer_tpu as khmer
from khmer_tpu import Countgraph, Nodegraph

from .conftest import reference_file

K = 12
KMER = "GGTTGACGGGGC"
SEQ = "GGTTGACGGGGCTCAGGGGGGCTA"
RC = str.maketrans("ACGT", "TGCA")


def fresh(k=K, size=5e4, nt=4):
    return Nodegraph(k, size, nt)


def rcomp(s):
    return s[::-1].translate(RC)


# -- presence semantics --------------------------------------------------

def test_presence_is_binary():
    ng = fresh()
    ng.count(KMER)
    ng.count(KMER)
    assert ng.get(KMER) == 1


def test_add_is_count_synonym():
    ng = fresh()
    if hasattr(ng, "add"):
        ng.add(KMER)
    else:
        ng.count(KMER)
    assert ng.get(KMER) == 1


def test_canonical_presence():
    ng = fresh()
    ng.count(KMER)
    assert ng.get(rcomp(KMER)) == 1


def test_absent_kmer_reads_zero():
    ng = fresh()
    assert ng.get("A" * K) == 0


def test_n_unique_counts_distinct_insertions():
    ng = fresh()
    ng.consume(SEQ)
    n1 = ng.n_unique_kmers()
    assert n1 > 0
    ng.consume(SEQ)
    assert ng.n_unique_kmers() == n1


def test_n_occupied_matches_countgraph():
    # same primes => same bucket occupancy as a countgraph fed the
    # same stream (reference test_n_occupied_vs_countgraph)
    ng = Nodegraph(K, 1e4, 3)
    cg = Countgraph(K, 1e4, 3)
    assert ng.hashsizes() == cg.hashsizes()
    ng.consume(SEQ)
    cg.consume(SEQ)
    assert ng.n_occupied() == cg.n_occupied()


def test_n_occupied_save_load(tmp_path):
    ng = fresh()
    ng.consume(SEQ)
    p = str(tmp_path / "x.pt")
    ng.save(p)
    ng2 = Nodegraph.load(p)
    assert ng2.n_occupied() == ng.n_occupied()


# -- update_from ---------------------------------------------------------

def test_update_from_unions_membership():
    a = Nodegraph(K, 1e4, 4)
    b = Nodegraph(K, 1e4, 4)
    a.count(KMER)
    other = "ACCTGGATTACC"
    b.count(other)
    a.update(b)
    assert a.get(KMER) == 1
    assert a.get(other) == 1
    assert b.get(KMER) == 0


@pytest.mark.parametrize("mk", [
    lambda: Nodegraph(K + 2, 1e4, 4),      # different ksize
    lambda: Nodegraph(K, 2e4, 4),          # different tablesize
    lambda: Nodegraph(K, 1e4, 3),          # different table count
])
def test_update_from_shape_mismatch_raises(mk):
    a = Nodegraph(K, 1e4, 4)
    with pytest.raises(ValueError):
        a.update(mk())


def test_update_from_alias():
    a = Nodegraph(K, 1e4, 4)
    b = Nodegraph(K, 1e4, 4)
    b.count(KMER)
    a.update_from(b)
    assert a.get(KMER) == 1


# -- tags ----------------------------------------------------------------

def test_add_tag_by_string_and_hash():
    ng = fresh()
    ng.add_tag(KMER)
    assert ng.n_tags() == 1
    ng.add_tag(ng.hash(KMER))        # same tag, no dup
    assert ng.n_tags() == 1


def test_get_tagset_returns_kmers():
    ng = fresh()
    ng.add_tag(KMER)
    tags = ng.get_tagset()
    assert len(tags) == 1
    assert tags[0] in (KMER, rcomp(KMER))


def test_tag_density_must_be_even():
    ng = fresh()
    ng._set_tag_density(42)
    assert ng._get_tag_density() == 42
    with pytest.raises(ValueError):
        ng._set_tag_density(7)


def test_consume_and_tag_places_tags():
    ng = fresh()
    ng.consume_and_tag(SEQ)
    assert ng.n_tags() >= 1
    # every tag must be a k-mer the graph contains
    for t in ng.get_tagset():
        assert ng.get(t) == 1


def test_get_tags_for_sequence():
    ng = fresh()
    ng.consume_and_tag(SEQ)
    tags = ng.get_tags_for_sequence(SEQ)
    assert set(tags) <= ng.all_tags
    assert len(tags) >= 1


def test_divide_tags_into_subsets():
    ng = fresh()
    for h in (5, 10, 15, 20, 25, 30):
        ng.add_tag(h)
    divvy = ng.divide_tags_into_subsets(2)
    assert divvy == [5, 15, 25]


def test_save_load_tagset_clear(tmp_path):
    ng = fresh()
    ng.add_tag(KMER)
    p = str(tmp_path / "t.tagset")
    ng.save_tagset(p)
    ng2 = fresh()
    ng2.add_tag("ACCTGGATTACC")
    ng2.load_tagset(p)                      # clear_tags default True
    assert ng2.all_tags == ng.all_tags


def test_save_load_tagset_noclear(tmp_path):
    ng = fresh()
    ng.add_tag(KMER)
    p = str(tmp_path / "t.tagset")
    ng.save_tagset(p)
    ng2 = fresh()
    ng2.add_tag("ACCTGGATTACC")
    ng2.load_tagset(p, clear_tags=False)
    assert len(ng2.all_tags) == 2


def test_load_tagset_wrong_ksize_fails(tmp_path):
    ng = fresh()
    ng.add_tag(KMER)
    p = str(tmp_path / "t.tagset")
    ng.save_tagset(p)
    other = Nodegraph(K + 2, 1e4, 4)
    with pytest.raises(OSError):
        other.load_tagset(p)


def test_load_tagset_truncated_fails(tmp_path):
    ng = fresh()
    for h in range(1, 30):
        ng.add_tag(h * 7)
    p = str(tmp_path / "t.tagset")
    ng.save_tagset(p)
    data = open(p, "rb").read()
    with open(p, "wb") as fh:
        fh.write(data[: len(data) // 2])
    with pytest.raises(OSError):
        fresh().load_tagset(p)


def test_load_tagset_from_notexist_fails(tmp_path):
    with pytest.raises(OSError):
        fresh().load_tagset(str(tmp_path / "nope.tagset"))


def test_tagset_filetype_check(tmp_path):
    # a stoptags file is not a tagset
    ng = fresh()
    ng.add_stop_tag(KMER)
    p = str(tmp_path / "s.stoptags")
    ng.save_stop_tags(p)
    with pytest.raises((OSError, ValueError)):
        fresh().load_tagset(p)


# -- stop tags -----------------------------------------------------------

def test_add_stop_tag():
    ng = fresh()
    ng.add_stop_tag(KMER)
    assert ng.n_stop_tags() == 1
    st = ng.get_stop_tags()
    assert st[0] in (KMER, rcomp(KMER))


def test_save_load_stop_tags_roundtrip(tmp_path):
    ng = fresh()
    ng.add_stop_tag(KMER)
    ng.add_stop_tag("ACCTGGATTACC")
    p = str(tmp_path / "s.stoptags")
    ng.save_stop_tags(p)
    ng2 = fresh()
    ng2.load_stop_tags(p)
    assert ng2.stop_tags == ng.stop_tags


def test_load_stop_tags_wrong_ksize_fails(tmp_path):
    ng = fresh()
    ng.add_stop_tag(KMER)
    p = str(tmp_path / "s.stoptags")
    ng.save_stop_tags(p)
    with pytest.raises(OSError):
        Nodegraph(K + 2, 1e4, 4).load_stop_tags(p)


def test_stoptags_filetype_check(tmp_path):
    ng = fresh()
    ng.add_tag(KMER)
    p = str(tmp_path / "t.tagset")
    ng.save_tagset(p)
    with pytest.raises((OSError, ValueError)):
        fresh().load_stop_tags(p)


def test_print_tagset_and_stop_tags(tmp_path):
    ng = fresh()
    ng.add_tag(KMER)
    ng.add_stop_tag(KMER)
    pt = str(tmp_path / "tags.txt")
    ps = str(tmp_path / "stop.txt")
    ng.print_tagset(pt)
    ng.print_stop_tags(ps)
    line = open(pt).read().strip()
    assert line in (KMER, rcomp(KMER))
    assert open(ps).read().strip() == line


# -- degree / neighbors --------------------------------------------------

def test_kmer_degree_isolated():
    ng = fresh()
    ng.count(KMER)
    assert ng.kmer_degree(KMER) == 0


def test_kmer_degree_linear_path():
    ng = fresh()
    ng.consume(SEQ)
    middle = SEQ[3:3 + K]
    assert ng.kmer_degree(middle) == 2
    first = SEQ[:K]
    assert ng.kmer_degree(first) >= 1


def test_neighbors_on_linear_path():
    ng = fresh()
    ng.consume(SEQ)
    nbrs = ng.neighbors(SEQ[1:1 + K])
    prev_h = ng.hash(SEQ[0:K])
    next_h = ng.hash(SEQ[2:2 + K])
    got = set(int(x) for x in nbrs)
    assert prev_h in got and next_h in got


def test_neighbors_wrong_ksize_raises():
    ng = fresh()
    with pytest.raises(ValueError):
        ng.neighbors("A" * (K + 3))


# -- traversal -----------------------------------------------------------

def test_traverse_linear_path_simple():
    ng = Nodegraph(K, 1e5, 4)
    ng.consume(SEQ)
    size, conns, visited = ng.traverse_linear_path(SEQ[:K])
    assert size == len(SEQ) - K + 1
    assert len(conns) == 0
    assert len(visited) == size


def test_traverse_linear_path_stops_at_high_degree():
    ng = Nodegraph(K, 1e5, 4)
    path = "ACCTGGATTACCGGATCCAATGGA"
    ng.consume(path)
    # branch off the middle: same k-1 prefix, two different last bases
    mid = 6
    branch = path[mid:mid + K - 1] + ("A" if path[mid + K - 1] != "A"
                                      else "C")
    ng.consume(path[mid - 1] + branch)
    hdn = ng.find_high_degree_nodes(path)
    size, conns, visited = ng.traverse_linear_path(path[:K])
    assert len(hdn) >= 1
    assert len(conns) >= 1


def test_calc_connected_graph_size():
    ng = Nodegraph(K, 1e5, 4)
    ng.consume(SEQ)
    n = ng.calc_connected_graph_size(SEQ[:K])
    assert n == len(SEQ) - K + 1


def test_calc_connected_graph_size_absent_kmer():
    ng = fresh()
    assert ng.calc_connected_graph_size("A" * K) == 0


# -- partitioned fasta ---------------------------------------------------

def test_consume_partitioned_fasta_groups_by_id(tmp_path):
    fa = str(tmp_path / "p.fa")
    with open(fa, "w") as fh:
        fh.write(">a\t3\n%s\n>b\t3\n%s\n>c\t5\n%s\n"
                 % (SEQ, SEQ, "ACCTGGATTACCGGATCCAATGG"))
    ng = Nodegraph(K, 1e5, 4)
    total, n_cons = ng.consume_partitioned_fasta(fa)
    assert total == 3
    n_part, _ = ng.count_partitions()
    assert n_part == 2


def test_consume_partitioned_fasta_bad_header_fails(tmp_path):
    fa = str(tmp_path / "bad.fa")
    with open(fa, "w") as fh:
        fh.write(">noid\n%s\n" % SEQ)
    ng = fresh()
    with pytest.raises((OSError, ValueError)):
        ng.consume_partitioned_fasta(fa)


# -- save/load error paths ----------------------------------------------

def test_nodegraph_load_countgraph_file_fails(tmp_path):
    cg = Countgraph(K, 1e4, 4)
    cg.consume(SEQ)
    p = str(tmp_path / "c.ct")
    cg.save(p)
    with pytest.raises((OSError, ValueError)):
        Nodegraph.load(p)


def test_nodegraph_bad_version_fails(tmp_path):
    ng = fresh()
    ng.consume(SEQ)
    p = str(tmp_path / "n.pt")
    ng.save(p)
    data = bytearray(open(p, "rb").read())
    data[4] = 250
    with open(p, "wb") as fh:
        fh.write(bytes(data))
    with pytest.raises((OSError, ValueError)):
        Nodegraph.load(p)


def test_nodegraph_save_load_gz(tmp_path):
    ng = fresh()
    ng.consume(SEQ)
    p = str(tmp_path / "n.pt.gz")
    ng.save(p)
    ng2 = Nodegraph.load(p)
    assert ng2.get(KMER) == 1
    assert ng2.hashsizes() == ng.hashsizes()


def test_reference_goldens_nodegraph_info():
    # header introspection on a reference-written nodegraph
    path = reference_file("normC20k20.ct")
    from khmer_tpu.core.oxli_io import extract_countgraph_info
    info = extract_countgraph_info(path)
    assert info is not None
