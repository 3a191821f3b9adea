"""Smoke tests for the sandbox-tier scripts added in this round
(sweep family, unassembled-read extraction, streaming assembly,
compact DBG, aligner training, variant collection).

Run in-process like the CLI script tests (reference
tests/khmer_tst_utils.py:153-206) — the sandbox scripts are loaded as
modules with patched argv.
"""

import importlib.util
import os
import re
import sys
from io import StringIO

import pytest

from tests.conftest import reference_file

SANDBOX = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "sandbox")


def run_sandbox(scriptname, args, in_directory):
    """Exec a sandbox script in-process with patched argv/stdio."""
    if SANDBOX not in sys.path:
        sys.path.insert(0, SANDBOX)
    spec = importlib.util.spec_from_file_location(
        scriptname.replace(".py", "").replace("-", "_"),
        os.path.join(SANDBOX, scriptname))
    mod = importlib.util.module_from_spec(spec)
    cwd = os.getcwd()
    oldargs, oldout, olderr = sys.argv, sys.stdout, sys.stderr
    sys.argv = [scriptname] + [str(a) for a in args]
    sys.stdout, sys.stderr = StringIO(), StringIO()
    status = 0
    try:
        os.chdir(str(in_directory))
        try:
            spec.loader.exec_module(mod)
            if hasattr(mod, "main"):
                mod.main()
        except SystemExit as err:
            status = err.code or 0
        out, err = sys.stdout.getvalue(), sys.stderr.getvalue()
    finally:
        sys.argv = oldargs
        sys.stdout, sys.stderr = oldout, olderr
        os.chdir(cwd)
    assert status == 0, "%s exited %s\nout:%s\nerr:%s" % (
        scriptname, status, out, err)
    return out, err


def count_fasta(path):
    with open(path) as fp:
        return sum(1 for line in fp if line.startswith(">"))


def test_sweep_reads2(tmp_path):
    query = reference_file("random-20-a.fa")
    search = reference_file("random-20-a.fa")
    out = str(tmp_path / "swept.fa")
    run_sandbox("sweep-reads2.py",
                ["-k", 20, "-x", 1e6, "-o", out, query, search],
                tmp_path)
    # every read overlaps itself
    assert count_fasta(out) == count_fasta(query)


def test_sweep_reads3(tmp_path):
    query = reference_file("random-20-a.fa")
    search = reference_file("random-20-b.fa")
    run_sandbox("sweep-reads3.py",
                ["-k", 20, "-x", 1e6, query, search], tmp_path)
    outfile = str(tmp_path / "random-20-a.fa.sweep3")
    assert os.path.exists(outfile)
    # a and b are disjoint random reads: some overlap possible but
    # sweeping a against itself must recover everything
    run_sandbox("sweep-reads3.py",
                ["-k", 20, "-x", 1e6, query, query], tmp_path)
    assert count_fasta(outfile) == count_fasta(query)


def test_sweep_out_reads_with_contigs(tmp_path):
    reads = reference_file("random-20-a.fa")
    contigs = reference_file("simple-genome.fa")
    out = str(tmp_path / "out.sweep")
    run_sandbox("sweep-out-reads-with-contigs.py",
                [reads, contigs, out], tmp_path)
    assert os.path.exists(out)


def test_sweep_reads_label_by_seq(tmp_path):
    db = reference_file("random-20-a.fa")
    query = reference_file("random-20-a.fa")
    run_sandbox("sweep-reads.py",
                ["-k", 21, "--label-by-seq", "--prefix", "swept",
                 "--outdir", str(tmp_path), db, query], tmp_path)
    dist = str(tmp_path / "swept.dist.txt")
    counts = str(tmp_path / "swept.counts.csv")
    assert os.path.exists(dist)
    assert os.path.exists(counts)
    # sweeping the db against itself: every read finds >= 1 label
    with open(dist) as fp:
        nums = [int(x) for x in fp if x.strip()]
    assert nums and all(n >= 1 for n in nums)


def test_sweep_files(tmp_path):
    db = reference_file("random-20-a.fa")
    query = reference_file("random-20-a.fa")
    run_sandbox("sweep-files.py",
                ["-k", 21, "--db", db, "--query", query,
                 "--outdir", str(tmp_path), "--prefix", "sf"],
                tmp_path)
    outfile = str(tmp_path / ("sf" + os.path.basename(db) + ".sweep"))
    assert os.path.exists(outfile)
    assert count_fasta(outfile) > 0


def test_extract_unassembled_reads(tmp_path):
    assembly = reference_file("simple-genome.fa")
    reads = reference_file("simple-genome-reads.fa")
    out = str(tmp_path / "leftover.fa")
    run_sandbox("extract-unassembled-reads.py",
                ["-k", 21, "-x", 1e6, "-o", out, assembly, reads],
                tmp_path)
    # reads are drawn from the genome, but sequencing errors create
    # off-genome tags that the assembly never labels -> only a
    # minority of reads comes out as "unassembled"
    assert 0 < count_fasta(out) < count_fasta(reads) * 0.5


def test_extract_unassembled_reads_2(tmp_path):
    assembly = reference_file("simple-genome.fa")
    reads = reference_file("simple-genome-reads.fa")
    out = str(tmp_path / "leftover.fa")
    run_sandbox("extract-unassembled-reads-2.py",
                ["-k", 21, "-x", 1e6, "-o", out, assembly, reads],
                tmp_path)
    assert count_fasta(out) < count_fasta(reads)


def test_reassemble_contigs(tmp_path):
    contigs = reference_file("simple-genome.fa")
    out, _ = run_sandbox("reassemble-contigs.py", [contigs], tmp_path)
    assert ">" in out
    # assembled contig should cover the (1kb) genome
    seqs = [l for l in out.splitlines() if l and not l.startswith(">")]
    assert max(len(s) for s in seqs) > 500


def test_extract_compact_dbg(tmp_path):
    # synthetic fork: two sequences share a prefix then diverge, so
    # the junction k-mer has degree > 2
    import random

    random.seed(42)
    core = "".join(random.choice("ACGT") for _ in range(80))
    a = core + "".join(random.choice("ACGT") for _ in range(60))
    b = core + "".join(random.choice("ACGT") for _ in range(60))
    seqs = str(tmp_path / "fork.fa")
    with open(seqs, "w") as fp:
        fp.write(">a\n%s\n>b\n%s\n" % (a, b))
    out = str(tmp_path / "out.gml")
    run_sandbox("extract-compact-dbg.py",
                ["-k", 21, "-x", 1e6, "-o", out, seqs], tmp_path)
    text = open(out).read()
    assert text.startswith("graph [")
    assert "node [" in text
    assert "edge [" in text


def test_calc_error_profile(tmp_path):
    # 1000 reads over a 1kb genome saturate coverage C=10 quickly
    src = reference_file("simple-genome-reads.fa")
    reads = str(tmp_path / "deep.fa")
    with open(reads, "w") as fp:
        fp.write(open(src).read())
    out = str(tmp_path / "errhist.txt")
    run_sandbox("calc-error-profile.py", ["-o", out, reads], tmp_path)
    lines = open(out).read().splitlines()
    assert lines[0].startswith("position")
    assert len(lines) > 10


def test_collect_variants(tmp_path):
    reads = reference_file("random-20-a.fa")
    run_sandbox("collect-variants.py",
                ["-k", 20, "-x", 1e6, "-N", 4, reads], tmp_path)
    out = str(tmp_path / "random-20-a.fa.keepvar")
    # unsaturated random reads: everything is kept
    assert count_fasta(out) == count_fasta(reads)


def test_readaligner_pairhmm_train(tmp_path):
    import json

    from khmer_tpu import Countgraph

    seq = ("ACCTAGGTTCGACATGTACGTAGCTACGTACGCTAGCATGCATCGATCGATC"
           "GATCGATCGATCGTACGATCGAGGCTAGCTACGATCAGCTACGATCAGCATC")
    cg = Countgraph(21, 1e5, 4)
    for _ in range(6):
        cg.consume(seq)
    ctfile = str(tmp_path / "reads.ct")
    cg.save(ctfile)

    samfile = str(tmp_path / "aln.sam")
    with open(samfile, "w") as fp:
        fp.write("@HD\tVN:1.6\n")
        for i in range(4):
            fp.write("r%d\t0\tchr1\t1\t60\t%dM\t*\t0\t0\t%s\t*\n"
                     % (i, len(seq), seq))

    out, _ = run_sandbox("readaligner_pairhmm_train.py",
                         ["--json", ctfile, samfile], tmp_path)
    params = json.loads(out)
    assert "transition_probabilities" in params
    # all-match trusted alignment: M_t->M_t dominates (near log2(1)=0;
    # slightly below because the first/last state has no transition)
    assert -0.1 < params["transition_probabilities"][0][0] <= 0.0


def test_streaming_assembly_scripts_import():
    """The saturation-driven assembly scripts need deep inputs; check
    they at least parse, import, and wire their helpers correctly."""
    if SANDBOX not in sys.path:
        sys.path.insert(0, SANDBOX)
    for name in ("assemble-and-track.py", "assemble-on-the-go.py",
                 "streaming-assembly-simple.py", "link-compact-dbg.py"):
        spec = importlib.util.spec_from_file_location(
            name.replace(".py", "").replace("-", "_"),
            os.path.join(SANDBOX, name))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert hasattr(mod, "main")


def test_translate_helpers():
    sys.path.insert(0, SANDBOX)
    import _sandbox

    peps = list(_sandbox.translate("ATGGCT"))
    assert len(peps) == 6
    assert peps[0] == "MA"
    orfs = list(_sandbox.extract_orfs("M" * 100 + "*" + "K" * 5,
                                      min_length=99))
    assert orfs == ["M" * 100]


def fasta_names(path):
    # rstrip like screed: an empty label list leaves a trailing tab
    with open(path) as fp:
        return set(line[1:].rstrip() for line in fp
                   if line.startswith(">"))


def test_sweep_reads_golden(tmp_path):
    """Reference tests/test_sandbox_scripts.py:107-147: exact output
    routing of the label-by-pid sweep on the golden sweep fixtures."""
    import shutil

    readfile = str(tmp_path / "test-sweep-reads.fa")
    contigfile = str(tmp_path / "test-sweep-contigs.fp")
    shutil.copyfile(reference_file("test-sweep-reads.fa"), readfile)
    shutil.copyfile(reference_file("test-sweep-contigs.fp"), contigfile)

    _, err = run_sandbox(
        "sweep-reads.py",
        ["-k", 25, "--prefix", "test", "--label-by-pid",
         contigfile, readfile, "junkfile.fa"], tmp_path)

    # the bad file is skipped without aborting
    assert "ERROR" in err, err
    assert "skipping" in err, err

    out1 = str(tmp_path / "test_0.fa")
    out2 = str(tmp_path / "test_1.fa")
    mout = str(tmp_path / "test_multi.fa")
    oout = str(tmp_path / "test_orphaned.fa")
    assert os.path.exists(out1)
    assert os.path.exists(out2)
    assert os.path.exists(mout)
    assert os.path.exists(oout)

    assert fasta_names(out1) == {"read1_p0\t0", "read2_p0\t0"}
    assert fasta_names(out2) == {"read3_p1\t1"}
    assert fasta_names(mout) in ({"read4_multi\t0\t1"},
                                 {"read4_multi\t1\t0"})
    assert fasta_names(oout) == {"read5_orphan"}


def test_sweep_reads_by_group_golden(tmp_path):
    """Reference tests/test_sandbox_scripts.py:200-230 (label-by-group
    on random-20-a.fa with group size 10 -> 10 groups of 9-10)."""
    import shutil

    infile = str(tmp_path / "random-20-a.fa")
    shutil.copyfile(reference_file("random-20-a.fa"), infile)

    run_sandbox(
        "sweep-reads.py",
        ["-m", 75, "-k", 20, "-l", 1, "--prefix", "test",
         "--label-by-group", 10, infile, infile], tmp_path)

    for i in range(10):
        p = str(tmp_path / ("test_%d.fa" % i))
        assert os.path.exists(p)
    counts_fn = str(tmp_path / "test.counts.csv")
    with open(counts_fn) as cfp:
        for line in cfp:
            _, _, c = line.partition(",")
            assert int(c) in (9, 10)
    assert os.path.exists(str(tmp_path / "test.dist.txt"))
    assert not os.path.exists(str(tmp_path / "test_multi.fa"))


def test_collect_reads_saturates(tmp_path):
    # deep coverage of a 1kb genome: -C 5 must stop before all reads
    reads = reference_file("simple-genome-reads.fa")
    ct = str(tmp_path / "out.ct")
    outfile = str(tmp_path / "collected.fa")
    out, err = run_sandbox(
        "collect-reads.py",
        ["-k", 20, "-x", 1e6, "-C", 5, "-o", outfile, ct, reads],
        tmp_path)
    assert "reached target average coverage:" in out
    assert os.path.exists(ct)
    n_in = sum(1 for line in open(reads) if line.startswith(">"))
    n_out = sum(1 for line in open(outfile) if line.startswith(">"))
    assert 0 < n_out < n_in
    m = re.search(r"Collected (\d+) reads", out)
    assert m and 0 < int(m.group(1)) <= n_in


def test_collect_reads_takes_everything_below_target(tmp_path):
    # shallow data vs high -C: every read is collected
    reads = reference_file("random-20-a.fa")
    ct = str(tmp_path / "all.ct")
    outfile = str(tmp_path / "all.fa")
    out, err = run_sandbox(
        "collect-reads.py",
        ["-k", 20, "-x", 1e6, "-C", 50, "-o", outfile, ct, reads],
        tmp_path)
    n_in = sum(1 for line in open(reads) if line.startswith(">"))
    n_out = sum(1 for line in open(outfile) if line.startswith(">"))
    assert n_out == n_in
    assert "Collected %d reads" % n_in in out


# -- round-4 rewrites of the remaining transcription-band scripts --------

def _write_reads(path, n=60, seed=5, length=80):
    import random

    rng = random.Random(seed)
    pool = ["".join(rng.choice("ACGT") for _ in range(length))
            for _ in range(6)]
    with open(path, "w") as fp:
        for i in range(n):
            seq = rng.choice(pool)
            fp.write(">r%d\n%s\n" % (i, seq))
    return pool


def test_multi_rename(tmp_path):
    with open(tmp_path / "in.fa", "w") as fp:
        fp.write(">long\n%s\n>short\nACGT\n" % ("ACGT" * 60))
    out, _ = run_sandbox("multi-rename.py", ["pre", "in.fa"], tmp_path)
    lines = out.splitlines()
    assert lines[0] == ">pre.1 long"
    assert all(len(l) <= 80 for l in lines[1:])
    assert "".join(lines[1:]) == "ACGT" * 60
    assert ">short" not in out  # below the 200bp cutoff


def test_shuffle_reverse_rotary(tmp_path):
    _write_reads(tmp_path / "in.fa", n=205)
    out, _ = run_sandbox("shuffle-reverse-rotary.py", ["in.fa"],
                         tmp_path)
    assert "shuffled 205 sequences" in out
    # records 1..205: record 1 -> bucket 1%100=1 -> file 100-1=099
    assert count_fasta(str(tmp_path / "in.fa.099")) == 3  # 1,101,201
    assert count_fasta(str(tmp_path / "in.fa.100")) == 2  # 100,200


def test_calc_median_distribution(tmp_path):
    _write_reads(tmp_path / "in.fa")
    from khmer_tpu import Countgraph

    g = Countgraph(17, 1e5, 4)
    g.consume_seqfile(str(tmp_path / "in.fa"))
    g.save(str(tmp_path / "g.ct"))
    run_sandbox("calc-median-distribution.py",
                ["g.ct", "in.fa", "hist.out"], tmp_path)
    rows = [l.split() for l in open(tmp_path / "hist.out")]
    assert len(rows) == 65536
    assert sum(int(r[1]) for r in rows) == 60
    assert abs(float(rows[-1][3]) - 1.0) < 1e-6


def test_slice_reads_by_coverage(tmp_path):
    _write_reads(tmp_path / "in.fa")
    from khmer_tpu import Countgraph

    g = Countgraph(17, 1e5, 4)
    g.consume_seqfile(str(tmp_path / "in.fa"))
    g.save(str(tmp_path / "g.ct"))
    out, err = run_sandbox(
        "slice-reads-by-coverage.py",
        ["-m", 1, "-M", 1000, "g.ct", "in.fa", "kept.fa"], tmp_path)
    assert count_fasta(str(tmp_path / "kept.fa")) == 60
    out, err = run_sandbox(
        "slice-reads-by-coverage.py",
        ["-m", 100000, "g.ct", "in.fa", "none.fa"], tmp_path)
    assert count_fasta(str(tmp_path / "none.fa")) == 0


def test_stoptag_abundance_hist(tmp_path):
    pool = _write_reads(tmp_path / "in.fa")
    from khmer_tpu import Countgraph

    g = Countgraph(17, 1e5, 4)
    g.consume_seqfile(str(tmp_path / "in.fa"))
    g.save(str(tmp_path / "g.ct"))
    with open(tmp_path / "kmers.txt", "w") as fp:
        fp.write(pool[0][:17] + "\n")
    run_sandbox("stoptag-abundance-hist.py",
                ["g.ct", "kmers.txt", "fig"], tmp_path)
    rows = [l.split() for l in open(tmp_path / "fig.countshist")]
    assert len(rows) == 1 and int(rows[0][1]) == 1


def test_graph_size_filter(tmp_path):
    import random

    rng = random.Random(11)
    big = "".join(rng.choice("ACGT") for _ in range(700))
    small = "".join(rng.choice("ACGT") for _ in range(40))
    with open(tmp_path / "in.fa", "w") as fp:
        fp.write(">big\n%s\n>small\n%s\n" % (big, small))
    out, _ = run_sandbox("graph-size.py", ["in.fa", "out.fa"], tmp_path)
    names = [l[1:].split()[0] for l in open(tmp_path / "out.fa")
             if l.startswith(">")]
    assert names == ["big"]
