"""Argument-framework battery mirroring the reference's
tests/test_script_arguments.py (space checks, graph sizing math,
create_* factories, memory-setting parser)."""

import sys
from io import StringIO

import pytest

import khmer_tpu
from khmer_tpu.cli import args as khmer_args
from khmer_tpu.utils import kfile


class FakeArgs(object):
    def __init__(self, ksize=None, n_tables=None, max_tablesize=None,
                 max_memory_usage=None, unique_kmers=0, fp_rate=None,
                 force=False):
        self.ksize = ksize if ksize is not None else khmer_args.DEFAULT_K
        self.n_tables = (n_tables if n_tables is not None
                         else khmer_args.DEFAULT_N_TABLES)
        self.max_tablesize = (max_tablesize if max_tablesize is not None
                              else khmer_args.DEFAULT_MAX_TABLESIZE)
        self.max_memory_usage = max_memory_usage
        self.unique_kmers = unique_kmers
        self.fp_rate = fp_rate
        self.force = force
        self.small_count = False




# -- disk-space checks ---------------------------------------------------

def test_check_space_fails_when_full(capsys, tmp_path):
    f = str(tmp_path / "x.fa")
    open(f, "w").write(">a\nACGT\n")
    with pytest.raises(SystemExit):
        kfile.check_space([f], force=False, _testhook_free_space=0)


def test_check_space_force_survives(capsys, tmp_path):
    f = str(tmp_path / "x.fa")
    open(f, "w").write(">a\nACGT\n")
    kfile.check_space([f], force=True, _testhook_free_space=0)
    assert "WARNING:" in capsys.readouterr().err


def test_check_space_for_graph_insufficient(capsys, tmp_path):
    out = str(tmp_path / "g.ct")
    with pytest.raises(SystemExit):
        kfile.check_space_for_graph(out, 16e9, force=False,
                                    _testhook_free_space=10e9)


def test_check_space_for_graph_force_warns(capsys, tmp_path):
    out = str(tmp_path / "g.ct")
    kfile.check_space_for_graph(out, 16e9, force=True,
                                _testhook_free_space=10e9)
    assert "Not enough free space" in capsys.readouterr().err


def test_check_space_for_graph_sufficient_is_silent(capsys, tmp_path):
    out = str(tmp_path / "g.ct")
    kfile.check_space_for_graph(out, 16e9, force=False,
                                _testhook_free_space=20e9)
    assert capsys.readouterr().err == ""


# -- graph sizing math ---------------------------------------------------

@pytest.mark.parametrize("graph_type,exp_buckets", [
    ("countgraph", "3.0 million buckets"),
    ("smallcountgraph", "6.0 million buckets"),
    ("nodegraph", "24.0 million buckets"),
])
def test_calculate_graphsize_by_memory(graph_type, exp_buckets):
    # -M 3G: bytes * buckets-per-byte spread over n_tables
    # (reference test_check_tablespace_nodegraph oracle strings)
    parser = khmer_args.build_counting_args()
    args = parser.parse_args(["-M", "3G"])
    buckets_per_table = khmer_args.calculate_graphsize(args, graph_type)
    total = buckets_per_table * args.n_tables
    assert "{:.1f} million buckets".format(total / 1e9) == exp_buckets


def test_calculate_graphsize_unknown_type():
    args = FakeArgs(max_memory_usage=1e7)
    with pytest.raises(ValueError) as err:
        khmer_args.calculate_graphsize(args, "foograph")
    assert "unknown graph type: foograph" in str(err.value)


def test_report_on_config_bad_graphtype():
    args = FakeArgs(max_memory_usage=1e7)
    with pytest.raises(ValueError) as err:
        khmer_args.report_on_config(args, "foograph")
    assert "unknown graph type: foograph" in str(err.value)


# -- create_* factories --------------------------------------------------

def test_create_countgraph_default_sizing():
    args = FakeArgs(max_memory_usage=1e7)
    cg = khmer_args.create_countgraph(args)
    assert cg.hashsizes() == [2499997, 2499989, 2499983, 2499967]
    assert sum(cg.hashsizes()) < 1e7


def test_create_countgraph_ksize_override():
    args = FakeArgs(max_memory_usage=1e7)
    cg = khmer_args.create_countgraph(args, ksize=15)
    assert cg.ksize() == 15


def test_create_countgraph_too_big_ksize(capsys):
    args = FakeArgs(max_memory_usage=1e7)
    with pytest.raises(SystemExit):
        khmer_args.create_countgraph(args, ksize=35)
    assert ("khmer only supports k-mer sizes <= 32."
            in capsys.readouterr().err)


def test_create_countgraph_too_many_tables(capsys):
    args = FakeArgs(n_tables=21, max_memory_usage=1e7)
    with pytest.raises(SystemExit):
        khmer_args.create_countgraph(args)
    assert ("khmer only supports number of tables <= 20."
            in capsys.readouterr().err)


def test_create_countgraph_too_many_tables_forced(capsys):
    args = FakeArgs(n_tables=21, max_memory_usage=1e7, force=True)
    khmer_args.create_countgraph(args)
    assert ("Maximum recommended number of tables is 20"
            in capsys.readouterr().err)


def test_create_countgraph_multiplier():
    args = FakeArgs(max_memory_usage=1e7)
    # multiplier scales memory UP (reference khmer_args.py:507-509);
    # the reference test's loose bound is sum < max_mem * multiplier
    cg = khmer_args.create_countgraph(args, multiplier=2.0)
    assert 1e7 < sum(cg.hashsizes()) < 1e7 * 2.0


def test_create_nodegraph_default_sizing():
    args = FakeArgs(max_memory_usage=1e7)
    ng = khmer_args.create_nodegraph(args)
    # bits: 8 buckets per byte
    assert sum(ng.hashsizes()) < 8e7


def test_create_nodegraph_ksize_override():
    args = FakeArgs(max_memory_usage=1e7)
    ng = khmer_args.create_nodegraph(args, ksize=15)
    assert ng.ksize() == 15


def test_create_nodegraph_too_big_ksize(capsys):
    args = FakeArgs(max_memory_usage=1e7)
    with pytest.raises(SystemExit):
        khmer_args.create_nodegraph(args, ksize=35)


def test_create_matching_nodegraph():
    args = FakeArgs(max_memory_usage=1e7)
    cg = khmer_args.create_countgraph(args)
    ng = khmer_args.create_matching_nodegraph(cg)
    assert ng.ksize() == cg.ksize()
    assert ng.hashsizes() == cg.hashsizes()


# -- memory setting parser ----------------------------------------------

@pytest.mark.parametrize("text,expected", [
    ("1", 1.0),
    ("42", 42.0),
    ("10000", 1e4),
    ("2.3e5", 230000.0),
    ("1e9", 1e9),
    ("1K", 1e3),
    ("3.14m", 3.14e6),
    ("8G", 8e9),
    ("8g", 8e9),
    ("16T", 16e12),
])
def test_memory_setting_valid(text, expected):
    assert khmer_args.memory_setting(text) == expected


@pytest.mark.parametrize("bad", ["16Tb", "16E", "16Ki", "b0gu$G"])
def test_memory_setting_invalid(bad):
    with pytest.raises(ValueError) as err:
        khmer_args.memory_setting(bad)
    assert "cannot parse memory setting" in str(err.value)
