"""filter-abund / filter-abund-single breadth battery.

Oracles mined from the reference's tests/test_filter_abund.py
(variable-coverage -V/-Z interplay, N handling, FASTQ retention,
casava names, quiet mode, md5-stable output).
"""

import hashlib
import os

import pytest

from khmer_tpu.io.fastx import FastxParser

from .script_utils import copy_test_data, get_test_data, runscript

GOOD = "GGTTGACGGGGCTCAGGG"
TRIMMED3 = "GGTTGACGGGGCTCAGGGGGCGGCTGACTCCGAGAGACAGC"
UNTRIMMED3 = ("GGTTGACGGGGCTCAGGGGGCGGCTGACTCCGAGAGACAGCgtgCCGCAGCTG"
              "TCGTCAGGGGATTTCCGGGCGG")


def _records(path):
    return list(FastxParser(path))


def _make_counting(infile, tmp_path, K="17"):
    out = str(tmp_path / (os.path.basename(infile) + ".ct"))
    runscript("load-into-counting.py",
              ["-k", K, "-x", "1e7", "-N", "2", out, infile],
              in_directory=os.path.dirname(infile))
    return out


def test_fq_retains_quality(tmp_path):
    # reference :128-149
    infile = copy_test_data("test-abund-read-2.fq", tmp_path)
    ct = _make_counting(infile, tmp_path)
    runscript("filter-abund.py", ["-C", "1", ct, infile, infile],
              in_directory=str(tmp_path))
    recs = _records(infile + ".abundfilt")
    seqs = set(r.sequence for r in recs)
    assert len(seqs) == 2
    assert GOOD in seqs
    quals = set(r.quality for r in recs)
    assert "##################" in quals


def test_fq_casava_18_names(tmp_path):
    # reference :154-168
    infile = copy_test_data("test-abund-read-2.paired2.fq", tmp_path)
    ct = _make_counting(infile, tmp_path)
    runscript("filter-abund.py", [ct, infile, infile],
              in_directory=str(tmp_path))
    names = set(r.name for r in _records(infile + ".abundfilt"))
    assert "pair:foo 1::N" in names, names


@pytest.mark.parametrize("single", [False, True])
def test_variable_coverage_retains_low_abund(tmp_path, single):
    # reference :224-257: -V must NOT trim low-abundance sequences
    infile = copy_test_data("test-abund-read-2.fa", tmp_path)
    if single:
        args = ["-k", "17", "-V", infile]
        runscript("filter-abund-single.py", args,
                  in_directory=str(tmp_path))
    else:
        ct = _make_counting(infile, tmp_path)
        runscript("filter-abund.py", ["-V", ct, infile],
                  in_directory=str(tmp_path))
    seqs = set(r.sequence for r in _records(infile + ".abundfilt"))
    assert len(seqs) == 2
    assert GOOD in seqs


@pytest.mark.parametrize("single", [False, True])
def test_variable_coverage_trims_high_abund(tmp_path, single):
    # reference :260-295: -V *does* trim high-abundance sequences
    infile = copy_test_data("test-abund-read-3.fa", tmp_path)
    if single:
        runscript("filter-abund-single.py", ["-k", "17", "-V", infile],
                  in_directory=str(tmp_path))
    else:
        ct = _make_counting(infile, tmp_path)
        runscript("filter-abund.py", ["-V", ct, infile],
                  in_directory=str(tmp_path))
    seqs = set(r.sequence for r in _records(infile + ".abundfilt"))
    assert len(seqs) == 2
    assert TRIMMED3 in seqs


def test_variable_coverage_Z_threshold_suppresses_trim(tmp_path):
    # reference :298-322: high -Z means "not high coverage" => no trim
    infile = copy_test_data("test-abund-read-3.fa", tmp_path)
    ct = _make_counting(infile, tmp_path)
    for script, args in (
            ("filter-abund.py", ["-V", "-Z", "25", ct, infile]),
            ("filter-abund-single.py",
             ["-k", "17", "-V", "-Z", "25", infile])):
        runscript(script, args, in_directory=str(tmp_path))
        seqs = set(r.sequence for r in _records(infile + ".abundfilt"))
        assert len(seqs) == 2
        assert UNTRIMMED3 in seqs


@pytest.mark.parametrize("single", [False, True])
def test_retains_Ns_and_counts_them_as_A(tmp_path, single):
    # reference :325-385
    infile = copy_test_data("test-filter-abund-Ns.fq", tmp_path)
    if single:
        runscript("filter-abund-single.py",
                  ["-k", "17", "-x", "1e7", "-N", "2", "-C", "3", infile],
                  in_directory=str(tmp_path))
    else:
        ct = _make_counting(infile, tmp_path)
        runscript("filter-abund.py", ["-C", "3", ct, infile],
                  in_directory=str(tmp_path))
    recs = _records(infile + ".abundfilt")
    names = set(r.name for r in recs)
    assert "895:1:37:17593:9954 1::FOO_withN" in names, names
    seqs = set(r.sequence for r in recs)
    assert "GGTTGACGGGGCTCAGGGGGCGGCTGACTCCGAG" not in seqs
    assert any("N" in s for s in seqs)


def test_outfile_md5_stable(tmp_path):
    # reference :387-395 — record-exact output vs the reference md5
    infile = get_test_data("paired-mixed-witherror.fa.pe")
    outfile = str(tmp_path / "out.abundfilt")
    runscript("filter-abund-single.py", ["-o", outfile, infile],
              in_directory=str(tmp_path))
    md5 = hashlib.md5(open(outfile, "rb").read()).hexdigest()
    assert md5 == "f17122f4c0c3dc0bcc4eeb375de93040", md5


def test_filter_abund_quiet(tmp_path):
    # reference :397-419
    infile = copy_test_data("test-abund-read-2.fa", tmp_path)
    ct = _make_counting(infile, tmp_path)
    _, out, err = runscript("filter-abund.py", ["-q", ct, infile],
                            in_directory=str(tmp_path))
    assert len(err) == 0, err
    assert os.path.exists(infile + ".abundfilt")


def test_filter_abund_single_quiet(tmp_path):
    # reference :422-434
    infile = copy_test_data("test-abund-read-2.fa", tmp_path)
    _, out, err = runscript(
        "filter-abund-single.py",
        ["-q", "-x", "1e7", "-N", "2", "-k", "17", infile],
        in_directory=str(tmp_path))
    assert len(err) == 0, err
    assert os.path.exists(infile + ".abundfilt")
