"""De Bruijn graph connectivity battery.

Mirrors the reference's tests/test_graph.py: exact component sizes on
test-graph.fa, 1-step link extension in all 8 directions, and the
connected/disconnected partition-count oracles on the random-20/31
fixtures.
"""

import pytest

import khmer_tpu as khmer

from .conftest import reference_file
from .script_utils import get_test_data


WORD = "TGCGTTTCAATC"


def make_graph():
    return khmer.Nodegraph(12, 1e4, 2)


def test_component_sizes_on_test_graph():
    ht = make_graph()
    ht.consume_seqfile(get_test_data("test-graph.fa"))
    assert ht.calc_connected_graph_size("TTAGGACTGCAC") == 69
    assert ht.calc_connected_graph_size("TGCGTTTCAATC") == 68
    assert ht.calc_connected_graph_size("ATACTGTAAATA") == 36


@pytest.mark.parametrize("base", "ACGT")
def test_graph_links_next(base):
    ht = make_graph()
    ht.consume(WORD)
    ht.consume(WORD[1:] + base)
    assert ht.calc_connected_graph_size(WORD) == 2


@pytest.mark.parametrize("base", "ACGT")
def test_graph_links_prev(base):
    ht = make_graph()
    ht.consume(WORD)
    ht.consume(base + WORD[:-1])
    assert ht.calc_connected_graph_size(WORD) == 2


# -- partition connectivity oracles --------------------------------------

def test_output_partitions_with_unassigned(tmp_path):
    filename = get_test_data("random-20-a.fa")
    ht = khmer.Nodegraph(21, 1, 1, primes=[5, 7, 11, 13])
    ht.consume_seqfile_and_tag(filename)
    out = str(tmp_path / "part0test")
    ht.output_partitions(filename, out, True)
    n_in = sum(1 for r in khmer.ReadParser(filename))
    n_out = sum(1 for r in khmer.ReadParser(out))
    assert n_in > 0 and n_in == n_out


def test_output_partitions_without_unassigned(tmp_path):
    filename = get_test_data("random-20-a.fa")
    ht = khmer.Nodegraph(21, 1, 1, primes=[5, 7, 11, 13])
    ht.consume_seqfile_and_tag(filename)
    out = str(tmp_path / "parttest")
    ht.output_partitions(filename, out, False)
    # ReadParser (like the reference's) refuses empty files, so check
    # the raw byte count instead
    import os
    assert os.path.getsize(out) == 0


def test_output_partitions_keeps_fastq_quality(tmp_path):
    filename = get_test_data("random-20-a.fq")
    ht = khmer.Nodegraph(20, 1e4, 4)
    ht.consume_seqfile_and_tag(filename)
    subset = ht.do_subset_partition(0, 0)
    ht.merge_subset(subset)
    out = str(tmp_path / "parttest.fq")
    ht.output_partitions(filename, out, False)
    quals = set(r.quality for r in khmer.ReadParser(out))
    assert quals


@pytest.mark.parametrize("fixture,k,size,expected", [
    ("random-20-a.fa", 21, 1e5, (99, 0)),   # disconnected @ 21
    ("random-20-a.fa", 20, 1e4, (1, 0)),    # connected @ 20
    ("random-20-b.fa", 21, 1e4, (99, 0)),
    ("random-20-b.fa", 20, 1e4, (1, 0)),
    ("random-31-c.fa", 32, 1e6, (999, 0)),
    ("random-31-c.fa", 31, 1e5, (1, 0)),
])
def test_partition_connectivity(fixture, k, size, expected):
    ht = khmer.Nodegraph(k, size, 4)
    ht.consume_seqfile_and_tag(get_test_data(fixture))
    subset = ht.do_subset_partition(0, 0)
    assert subset.count_partitions() == expected
