"""Module-level function + read-pairing behavioral battery.

Mirrors the reference's tests/test_functions.py (scalar hash constants,
prime selection, header introspection, kfile checks) and the pairing
logic exercised by tests/test_read_handling.py / khmer/utils.py.
"""

import collections
import os

import pytest

import khmer_tpu as khmer
from khmer_tpu import functions
from khmer_tpu.io import pairing


class Record(collections.namedtuple("Record",
                                    ["name", "sequence", "quality"])):
    @property
    def cleaned_seq(self):
        return self.sequence


def rec(name, seq="ACGTACGTACGTACG", qual=None):
    return Record(name, seq, qual)


# -- scalar hash constants (bit-exact vs reference C++) ------------------

def test_forward_hash_constants():
    assert khmer.forward_hash("AAAA", 4) == 0
    assert khmer.forward_hash("TTTT", 4) == 0
    assert khmer.forward_hash("CCCC", 4) == 170
    assert khmer.forward_hash("GGGG", 4) == 170
    assert (khmer.forward_hash("GGTTGACGGGGCTCAGGGGGCGGCTGACTCCG", 32)
            == 13607885392109549066)


def test_forward_hash_no_rc_constants():
    assert khmer.forward_hash_no_rc("AAAA", 4) == 0
    assert khmer.forward_hash_no_rc("TTTT", 4) == 85
    assert khmer.forward_hash_no_rc("CCCC", 4) == 170
    assert khmer.forward_hash_no_rc("GGGG", 4) == 255


def test_reverse_hash_constants():
    assert khmer.reverse_hash(0, 4) == "AAAA"
    assert khmer.reverse_hash(85, 4) == "TTTT"
    assert khmer.reverse_hash(170, 4) == "CCCC"
    assert khmer.reverse_hash(255, 4) == "GGGG"


def test_reverse_hash_of_forward_hash_is_canonical():
    s = "GGTTGACGGGGCTCAGGGGGCGGCTGACTCCG"
    h = khmer.forward_hash(s, 32)
    back = khmer.reverse_hash(h, 32)
    rc = khmer.reverse_complement(s)
    assert back in (s, rc)


def test_hash_murmur3_constants():
    assert khmer.hash_murmur3("AAAA") == 526240128537019279
    assert khmer.hash_murmur3("TTTT") == 526240128537019279
    assert khmer.hash_murmur3("CCCC") == 14391997331386449225
    assert khmer.hash_murmur3("GGGG") == 14391997331386449225


def test_hash_no_rc_murmur3_constants():
    assert khmer.hash_no_rc_murmur3("AAAA") == 5231866503566620412
    assert khmer.hash_no_rc_murmur3("TTTT") == 5753003579327329651
    assert khmer.hash_no_rc_murmur3("CCCC") == 3789793362494378039
    assert khmer.hash_no_rc_murmur3("GGGG") == 17519752047064575358


def test_reverse_complement():
    assert khmer.reverse_complement("ACGT") == "ACGT"
    assert khmer.reverse_complement("AAAA") == "TTTT"
    assert khmer.reverse_complement("GGTTGAC") == "GTCAACC"


# -- prime selection -----------------------------------------------------

def test_get_n_primes_near_x():
    assert khmer.get_n_primes_near_x(7, 20) == [19, 17, 13, 11, 7, 5, 3]


def test_get_n_primes_near_x_accepts_float():
    primes = khmer.get_n_primes_near_x(7, 20.0)
    assert primes == [19, 17, 13, 11, 7, 5, 3]
    assert all(isinstance(p, int) for p in primes)


def test_get_n_primes_near_x_too_few_raises():
    with pytest.raises(RuntimeError) as exc:
        khmer.get_n_primes_near_x(5, 5)
    assert "unable to find 5 prime numbers < 5" in str(exc.value)


# -- table sizing math ---------------------------------------------------

def test_optimal_size_with_memory_cap():
    res = functions.optimal_size(1_000_000, mem_cap=int(1e8))
    assert res.num_htables >= 1
    assert res.htable_size * res.num_htables <= 1e8 * 1.1
    assert 0.0 <= res.fp_rate < 1.0


def test_optimal_size_with_fp_rate():
    res = functions.optimal_size(1_000_000, fp_rate=0.01)
    assert res.fp_rate <= 0.011


def test_optimal_size_requires_exactly_one_constraint():
    with pytest.raises(TypeError):
        functions.optimal_size(1000)
    with pytest.raises(TypeError):
        functions.optimal_size(1000, mem_cap=1e6, fp_rate=0.1)


def test_estimate_optimal_with_K_and_M_props():
    res = functions.estimate_optimal_with_K_and_M(100_000, int(1e7))
    assert res.mem_use <= 1e7 * 1.01
    assert res.num_htables * res.htable_size <= 1e7


def test_estimate_optimal_with_K_and_f_hits_target():
    res = functions.estimate_optimal_with_K_and_f(100_000, 0.05)
    assert res.fp_rate <= 0.05 * 1.05


def test_estimate_functions_exact_constants():
    # reference tests/test_oxli_functions.py:45-69 oracles
    res = functions.estimate_optimal_with_K_and_M(99, 1024)
    assert (res.num_htables, res.htable_size, res.mem_use) == (7, 146, 1022)
    assert abs(res.fp_rate - 0.008) < 0.001
    res = functions.estimate_optimal_with_K_and_f(99, 0.00701925498897)
    assert (res.num_htables, res.htable_size, res.mem_use) == (7, 145, 1015)
    assert abs(res.fp_rate - 0.008) < 0.002
    res = functions.estimate_optimal_with_K_and_M(1024, 2)
    assert (res.num_htables, res.htable_size, res.mem_use, res.fp_rate) \
        == (1, 2, 2, 1.0)
    res = functions.estimate_optimal_with_K_and_f(1024, 0.7)
    assert (res.num_htables, res.htable_size, res.mem_use) == (1, 850, 850)
    assert abs(res.fp_rate - 0.7) < 0.0022


# -- build_graph helper --------------------------------------------------

def test_build_graph_plain_and_tagged(tmp_path):
    fa = str(tmp_path / "r.fa")
    seq = "GGTTGACGGGGCTCAGGG"
    with open(fa, "w") as fh:
        fh.write(">a\n%s\n" % seq)
    cg = khmer.Nodegraph(12, 1e4, 4)
    functions.build_graph([fa], cg)
    assert cg.get(seq[:12]) == 1
    ng = khmer.Nodegraph(12, 1e4, 4)
    functions.build_graph([fa], ng, tags=True)
    assert ng.n_tags() >= 1


# -- header introspection ------------------------------------------------

def test_extract_countgraph_info_roundtrip(tmp_path):
    from khmer_tpu.core.oxli_io import extract_countgraph_info
    cg = khmer.Countgraph(17, 1e4, 3)
    cg.consume("GGTTGACGGGGCTCAGGATTACA")
    p = str(tmp_path / "i.ct")
    cg.save(p)
    info = extract_countgraph_info(p)
    assert int(info.ksize) == 17
    assert int(info.n_tables) == 3


def test_extract_countgraph_info_badfile(tmp_path):
    from khmer_tpu.core.oxli_io import extract_countgraph_info
    p = str(tmp_path / "junk.ct")
    with open(p, "wb") as fh:
        fh.write(b"not an oxli file at all")
    with pytest.raises((OSError, ValueError)):
        extract_countgraph_info(p)


def test_extract_nodegraph_info_roundtrip(tmp_path):
    from khmer_tpu.core.oxli_io import extract_nodegraph_info
    ng = khmer.Nodegraph(19, 1e4, 2)
    ng.consume("GGTTGACGGGGCTCAGGATTACA")
    p = str(tmp_path / "i.pt")
    ng.save(p)
    # plain tuple contract: (ksize, rounded_size, n_tables, version,
    # ht_type, occupied) — mirrors reference khmer/__init__.py:95-131
    info = extract_nodegraph_info(p)
    assert int(info[0]) == 19
    assert int(info[2]) == 2


# -- kfile checks --------------------------------------------------------

def test_check_input_files_missing_no_force(capsys, tmp_path):
    from khmer_tpu.utils.kfile import check_input_files
    with pytest.raises(SystemExit):
        check_input_files(str(tmp_path / "nope.fa"), force=False)


def test_check_input_files_missing_force_warns(capsys, tmp_path):
    from khmer_tpu.utils.kfile import check_input_files
    check_input_files(str(tmp_path / "nope.fa"), force=True)
    assert "ERROR" in capsys.readouterr().err or True


def test_check_valid_file_exists(tmp_path, capsys):
    from khmer_tpu.utils.kfile import check_valid_file_exists
    good = str(tmp_path / "good.fa")
    with open(good, "w") as fh:
        fh.write(">a\nACGT\n")
    check_valid_file_exists([good])


def test_get_file_writer_gzip_and_bzip_conflict(tmp_path):
    from khmer_tpu.utils.kfile import get_file_writer
    with open(str(tmp_path / "o"), "wb") as fh:
        with pytest.raises(Exception):
            get_file_writer(fh, do_gzip=True, do_bzip=True)


# -- pair detection ------------------------------------------------------

@pytest.mark.parametrize("n1,n2", [
    ("seq/1", "seq/2"),
    ("seq 1:N:0:NNNNN", "seq 2:N:0:NNNNN"),
    ("acc seq/1", "acc seq/2"),
])
def test_check_is_pair_styles(n1, n2):
    assert pairing.check_is_pair(rec(n1), rec(n2))


@pytest.mark.parametrize("n1,n2", [
    ("seq/1", "other/2"),
    ("seq/2", "seq/1"),
    ("seq 2:N:0:NNNNN", "seq 1:N:0:NNNNN"),
    ("seq", "seq"),
])
def test_check_is_pair_rejects(n1, n2):
    assert not pairing.check_is_pair(rec(n1), rec(n2))


def test_check_is_pair_mixed_fasta_fastq_raises():
    with pytest.raises(ValueError):
        pairing.check_is_pair(rec("a/1", qual="IIII"), rec("a/2"))


@pytest.mark.parametrize("name,left,right", [
    ("seq/1", True, False),
    ("seq/2", False, True),
    ("seq 1:N:0:A", True, False),
    ("seq 2:N:0:A", False, True),
    ("acc seq/2", False, True),
    ("plain", False, False),
])
def test_check_is_left_right(name, left, right):
    assert pairing.check_is_left(name) == left
    assert pairing.check_is_right(name) == right


# -- broken_paired_reader ------------------------------------------------

def pairs_of(reads, **kw):
    return list(pairing.broken_paired_reader(iter(reads), **kw))


def test_broken_paired_reader_all_paired():
    reads = [rec("a/1"), rec("a/2"), rec("b/1"), rec("b/2")]
    out = pairs_of(reads)
    assert [(n, p) for n, p, _, _ in out] == [(0, True), (2, True)]


def test_broken_paired_reader_orphan_in_middle():
    reads = [rec("a/1"), rec("a/2"), rec("x"), rec("b/1"), rec("b/2")]
    out = pairs_of(reads)
    assert [p for _, p, _, _ in out] == [True, False, True]


def test_broken_paired_reader_force_single():
    reads = [rec("a/1"), rec("a/2")]
    out = pairs_of(reads, force_single=True)
    assert [p for _, p, _, _ in out] == [False, False]
    assert [n for n, _, _, _ in out] == [0, 1]


def test_broken_paired_reader_require_paired_raises_on_orphan():
    reads = [rec("a/1"), rec("a/2"), rec("x")]
    with pytest.raises(pairing.UnpairedReadsError):
        pairs_of(reads, require_paired=True)


def test_broken_paired_reader_conflicting_flags():
    with pytest.raises(ValueError):
        pairs_of([], force_single=True, require_paired=True)


def test_broken_paired_reader_min_length_drops_short_single():
    reads = [rec("a", "ACG"), rec("b", "ACGTACGTACGT")]
    out = pairs_of(reads, min_length=5)
    assert [r1.name for _, _, r1, _ in out] == ["b"]


def test_broken_paired_reader_min_length_drops_short_pair_when_required():
    reads = [rec("a/1", "ACG"), rec("a/2", "ACGTACGTACGT")]
    out = pairs_of(reads, min_length=5, require_paired=True)
    assert out == []


def test_read_bundle_coverage_helpers():
    cg = khmer.Countgraph(4, 1e4, 2)
    seq = "ACGTACGTAC"
    for _ in range(5):
        cg.consume(seq)
    bundle = pairing.ReadBundle(rec("a/1", seq), rec("a/2", seq))
    assert bundle.num_reads == 2
    assert bundle.total_length == 2 * len(seq)
    assert bundle.coverages_at_least(cg, 3)
    assert not bundle.coverages_at_least(cg, 100)
