"""normalize-by-median CLI breadth battery.

Second tier of script-level coverage beyond tests/test_normalize.py:
reporting, sanity checks, arg validation, force/quiet modes, and exact
stderr oracles mined from the reference's
tests/test_normalize_by_median.py (line refs per test).
"""

import os
import shutil

import pytest

from khmer_tpu.io.fastx import FastxParser

from .script_utils import copy_test_data, get_test_data, runscript


def _seqs(path):
    return [r.sequence for r in FastxParser(path)]


def test_loadgraph_with_args_warns(tmp_path):
    # reference :59-72
    infile = copy_test_data("test-abund-read-2.fa", tmp_path)
    table = str(tmp_path / "table.ct")
    runscript("load-into-counting.py", [table, infile],
              in_directory=str(tmp_path))
    (_, _, err) = runscript(
        "normalize-by-median.py",
        ["--ksize", "7", "--loadgraph", table, infile],
        in_directory=str(tmp_path))
    assert "WARNING: You are loading a saved k-mer countgraph from" in err


def test_quiet_mode_suppresses_stdout(tmp_path):
    # reference :108-128
    infile = copy_test_data("test-abund-read-2.fa", tmp_path)
    (_, out, err) = runscript(
        "normalize-by-median.py",
        ["-C", "1", "-k", "17", "--quiet", "-M", "2e6", infile],
        in_directory=str(tmp_path))
    assert len(out) == 0, out
    seqs = _seqs(infile + ".keep")
    assert len(seqs) == 1
    assert seqs[0].startswith("GGTTGACGGGGCTCAGGGGG")


def test_unpaired_final_read_with_require_paired(tmp_path):
    # reference :130-141
    infile = copy_test_data("single-read.fq", tmp_path)
    (status, _, err) = runscript(
        "normalize-by-median.py",
        ["-C", "1", "-k", "17", "-p", infile],
        in_directory=str(tmp_path), fail_ok=True)
    assert status != 0
    assert "ERROR: Unpaired reads when require_paired" in err, err


def test_sanity_check_fp_ceiling(tmp_path):
    # reference :143-152
    infile = copy_test_data("single-read.fq", tmp_path)
    (status, _, err) = runscript(
        "normalize-by-median.py",
        ["-U", "1024", "--max-mem", "60", infile],
        in_directory=str(tmp_path), fail_ok=True)
    assert status != 0
    assert "recommended false positive ceiling of 0.1!" in err, err


def test_sanity_check_tablesize_too_small(tmp_path):
    # reference :154-163
    infile = copy_test_data("test-filter-abund-Ns.fq", tmp_path)
    (status, _, err) = runscript(
        "normalize-by-median.py",
        ["-U", "83", "--max-tablesize", "17", infile],
        in_directory=str(tmp_path), fail_ok=True)
    assert status != 0
    assert "Warning: The given tablesize is too small!" in err, err


def test_sanity_check_auto_memory_ceiling(tmp_path):
    # reference :165-175
    infile = copy_test_data("test-filter-abund-Ns.fq", tmp_path)
    (_, _, err) = runscript(
        "normalize-by-median.py", ["-U", "83", infile],
        in_directory=str(tmp_path))
    assert "*** INFO: set memory ceiling automatically." in err, err
    assert "*** Ceiling is: 1e+06 bytes" in err, err


def test_unforced_badfile_removes_keep(tmp_path):
    # reference :195-209
    infile = str(tmp_path / "potatoes")
    (status, _, err) = runscript(
        "normalize-by-median.py", ["-C", "1", "-k", "17", infile],
        in_directory=str(tmp_path), fail_ok=True)
    assert status != 0
    assert "ERROR: [Errno 2] No such file or directory:" in err, err
    assert not os.path.exists(infile + ".keep")


def test_contradictory_args_rejected(tmp_path):
    # reference :211-222: --force_single and -p cannot both be set
    infile = copy_test_data("test-abund-read-2.fa", tmp_path)
    report = str(tmp_path / "report.out")
    (status, _, err) = runscript(
        "normalize-by-median.py",
        ["-C", "1", "-k", "17", "--force_single", "-p", "-R", report,
         infile],
        in_directory=str(tmp_path), fail_ok=True)
    assert status != 0
    assert "cannot both be set" in err, err


def test_stdout_output_dash(tmp_path):
    # reference :224-237
    infile = copy_test_data("test-abund-read-2.fa", tmp_path)
    (_, _, err) = runscript(
        "normalize-by-median.py",
        ["-C", "1", "-k", "17", infile, "--out", "-"],
        in_directory=str(tmp_path))
    assert "Total number of unique k-mers: 98" in err, err
    assert "in block device" in err, err


def test_report_two_files_exact_lines(tmp_path):
    # reference :258-280 — aggregate report rows across two inputs
    infile = copy_test_data("test-abund-read-2.fa", tmp_path)
    infile2 = str(tmp_path / "copy-data-two.fa")
    shutil.copyfile(infile, infile2)
    report = str(tmp_path / "report.out")
    runscript("normalize-by-median.py",
              ["-C", "1", "-k", "17", "-R", report, infile, infile2],
              in_directory=str(tmp_path))
    lines = [ln.strip() for ln in open(report)]
    assert lines[0] == "total,kept,f_kept", lines
    assert lines[1] == "1001,1,0.000999", lines
    assert lines[2] == "2002,1,0.0004995", lines


def test_report_frequency_exact_lines(tmp_path):
    # reference :282-305
    infile = copy_test_data("test-abund-read-2.fa", tmp_path)
    report = str(tmp_path / "report.out")
    runscript("normalize-by-median.py",
              ["-C", "1", "-k", "17", "-R", report, infile,
               "--report-frequency", "100"],
              in_directory=str(tmp_path))
    lines = [ln.strip() for ln in open(report)]
    assert lines[0] == "total,kept,f_kept", lines
    assert lines[1] == "100,1,0.01", lines
    assert lines[2] == "200,1,0.005", lines


def test_unpaired_and_paired_inputs(tmp_path):
    # reference :326-342
    infile = copy_test_data("test-abund-read-paired.fa", tmp_path)
    unpaired = copy_test_data("random-20-a.fa", tmp_path)
    (_, _, err) = runscript(
        "normalize-by-median.py",
        ["-C", "1", "-k", "17", "-u", unpaired, "-p", infile],
        in_directory=str(tmp_path))
    assert "Total number of unique k-mers: 4061" in err, err
    assert os.path.exists(infile + ".keep")


def test_double_file_name_rejected(tmp_path):
    # reference :364-374
    infile = copy_test_data("test-abund-read-2.fa", tmp_path)
    (status, _, err) = runscript(
        "normalize-by-median.py",
        [get_test_data("test-abund-read-2.fa"), infile],
        in_directory=str(tmp_path), fail_ok=True)
    assert status != 0
    assert "Duplicate filename--Cannot handle this!" in err, err


def test_stdin_requires_output_name(tmp_path):
    # reference :376-386
    (status, _, err) = runscript(
        "normalize-by-median.py", ["-"],
        in_directory=str(tmp_path), fail_ok=True)
    assert status != 0
    assert "Accepting input from stdin; output filename" in err, err


def test_output_overwrites_existing_file(tmp_path):
    # reference :388-402
    outfile = copy_test_data("test-abund-read.fa", tmp_path)
    infile = copy_test_data("test-abund-read-3.fa", tmp_path)
    runscript("normalize-by-median.py",
              ["-C", "1", "-k", "17", "-o", outfile, infile],
              in_directory=str(tmp_path))
    seqs = _seqs(outfile)
    assert len(seqs) == 1, seqs
    assert "GACAGCgtgCCGCA" in seqs[0], seqs


def test_version_banner(tmp_path):
    # reference :404-419
    (_, _, err) = runscript("normalize-by-median.py", ["--version"],
                            in_directory=str(tmp_path), fail_ok=True)
    banner = [ln for ln in err.splitlines()
              if ln.strip() and not ln.startswith("||")]
    assert banner and banner[0].startswith("khmer"), err


def test_force_skips_corrupt_file(tmp_path):
    # reference :499-514
    corrupt = copy_test_data("test-error-reads.fq", tmp_path)
    good = copy_test_data("test-fastq-reads.fq", tmp_path)
    (_, _, err) = runscript(
        "normalize-by-median.py",
        ["-f", "-C", "1", "-k", "17", corrupt, good],
        in_directory=str(tmp_path))
    assert "*** Skipping" in err, err
    assert "** I/O Errors" in err, err


def test_cutoff_256_rejected(tmp_path):
    # reference :516-529 — no bigcount in diginorm, C must be < 256
    infile = copy_test_data("test-abund-read-2.fa", tmp_path)
    hashfile = str(tmp_path / "test-out.ct")
    (status, _, err) = runscript(
        "normalize-by-median.py",
        ["-C", "256", "-k 8", "--savegraph", hashfile, infile],
        in_directory=str(tmp_path), fail_ok=True)
    assert status == 1, (status, err)
    assert "ERROR: khmer only supports 0 <= cutoff < 256" in err, err


def test_empty_input_produces_empty_keep(tmp_path):
    # reference :531-543
    infile = copy_test_data("test-empty.fa", tmp_path)
    runscript("normalize-by-median.py",
              ["-C", "1", "-k", "17", infile],
              in_directory=str(tmp_path))
    assert os.path.exists(infile + ".keep")


def test_loadgraph_from_fasta_fails(tmp_path):
    # reference :545-556 — loading a FASTA as a countgraph must fail
    infile = copy_test_data("test-empty.fa", tmp_path)
    (status, _, err) = runscript(
        "normalize-by-median.py",
        ["-C", "1", "--loadgraph", infile, infile],
        in_directory=str(tmp_path), fail_ok=True)
    assert status != 0
    assert "ValueError" in err, (status, err)


def test_fp_rate_too_high_aborts(tmp_path):
    # reference :558-571
    infile = copy_test_data("test-fastq-reads.fq", tmp_path)
    (status, _, err) = runscript(
        "normalize-by-median.py",
        ["-f", "-k 17", "-x 12", infile],
        in_directory=str(tmp_path), fail_ok=True)
    assert status != 0
    assert os.path.exists(infile + ".keep")
    assert "** ERROR: the graph structure is too small" in err, err
