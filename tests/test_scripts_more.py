"""Script-level behavioral tests for the CLI surface.

Modeled on the reference's test strategy (tests/test_scripts.py — 136
in-process script runs asserting exact stderr strings and output
files); assertions mirror the reference's expected values on the same
golden inputs.
"""

import json
import os

import pytest

from tests.script_utils import (get_test_data, copy_test_data,
                                runscript)


def _reads(path):
    from khmer_tpu.core.pipeline import records_from

    return list(records_from(path))


# -- load-into-counting behavioral contract -------------------------------

def test_load_into_counting_unique_kmers(tmp_path):
    out = str(tmp_path / "out.ct")
    _, _, err = runscript("load-into-counting.py",
                          ["-x", "1e3", "-N", "2", "-k", "20", out,
                           get_test_data("test-abund-read-2.fa")])
    assert "Total number of unique k-mers: 94" in err, err
    assert os.path.exists(out)


def test_load_into_counting_smallcount(tmp_path):
    out = str(tmp_path / "out.ct")
    _, _, err = runscript("load-into-counting.py",
                          ["-x", "1e3", "--small-count", out,
                           get_test_data("test-abund-read-2.fa")])
    assert "Total number of unique k-mers: 83" in err, err


def test_load_into_counting_multifile(tmp_path):
    out = str(tmp_path / "out.kh")
    infile = get_test_data("test-abund-read-2.fa")
    _, _, err = runscript("load-into-counting.py",
                          ["-x", "1e7", "-N", "2", "-k", "20", out]
                          + [infile] * 12)
    assert "Total number of unique k-mers: 95" in err, err


def test_load_into_counting_tsv(tmp_path):
    out = str(tmp_path / "out.ct")
    infile = get_test_data("test-abund-read-2.fa")
    _, _, err = runscript("load-into-counting.py",
                          ["-x", "1e7", "-N", "2", "-k", "20",
                           "-s", "tsv", out, infile])
    lines = open(out + ".info.tsv").readlines()
    assert len(lines) == 2
    assert lines[1] == "\t".join([os.path.basename(out), "0.000", "95",
                                  "1001", infile]) + "\n", lines


def test_load_into_counting_json(tmp_path):
    out = str(tmp_path / "out.ct")
    infile = get_test_data("test-abund-read-2.fa")
    runscript("load-into-counting.py",
              ["-x", "1e7", "-N", "2", "-k", "20", "-s", "json", out,
               infile])
    got = json.load(open(out + ".info.json"))
    assert got["num_kmers"] == 95
    assert got["num_reads"] == 1001
    assert got["files"] == [infile]
    assert abs(got["fpr"] - 9.025048735197377e-11) < 1e-15


def test_load_into_counting_bad_summary_fmt(tmp_path):
    out = str(tmp_path / "out.ct")
    status, _, err = runscript(
        "load-into-counting.py",
        ["-x", "1e7", "-s", "badfmt", out,
         get_test_data("test-abund-read-2.fa")], fail_ok=True)
    assert status != 0
    assert "invalid choice: 'badfmt'" in err, err


def test_load_into_counting_fp_abort(tmp_path):
    out = str(tmp_path / "out.ct")
    status, _, err = runscript(
        "load-into-counting.py",
        ["-x", "1e2", "-N", "2", "-k", "20", out,
         get_test_data("test-abund-read-2.fa")], fail_ok=True)
    assert status != 0
    assert "ERROR" in err


# -- filter/trim scripts ---------------------------------------------------

def test_filter_abund_keeps_highabund(tmp_path):
    graph = str(tmp_path / "g.ct")
    infile = copy_test_data("test-abund-read-2.fa", tmp_path)
    runscript("load-into-counting.py",
              ["-x", "1e7", "-k", "17", graph, infile])
    runscript("filter-abund.py", [graph, infile],
              in_directory=str(tmp_path))
    out = infile + ".abundfilt"
    assert os.path.exists(out)
    seqs = {r.sequence for r in _reads(out)}
    assert len(seqs) == 1
    assert "GGTTGACGGGGCTCAGGG" in seqs.pop()


def test_filter_abund_single(tmp_path):
    infile = copy_test_data("test-abund-read-2.fa", tmp_path)
    _, _, err = runscript("filter-abund-single.py",
                          ["-x", "1e7", "-N", "2", "-k", "17", infile],
                          in_directory=str(tmp_path))
    assert os.path.exists(infile + ".abundfilt")
    assert "Total number of unique k-mers: 98" in err, err


def test_filter_abund_paired_variable(tmp_path):
    graph = str(tmp_path / "g.ct")
    infile = copy_test_data("test-abund-read-paired.fa", tmp_path)
    runscript("load-into-counting.py",
              ["-x", "1e7", "-k", "17", graph, infile])
    runscript("filter-abund.py", ["-V", graph, infile],
              in_directory=str(tmp_path))
    names = [r.name for r in _reads(infile + ".abundfilt")]
    assert any("895:1:37:17593:9954" in n for n in names)


def test_trim_low_abund_basic(tmp_path):
    infile = copy_test_data("test-abund-read-2.fa", tmp_path)
    runscript("trim-low-abund.py",
              ["-k", "17", "-x", "1e7", "-N", "2", infile],
              in_directory=str(tmp_path))
    out = infile + ".abundtrim"
    assert os.path.exists(out)
    seqs = {r.sequence for r in _reads(out)}
    assert "GGTTGACGGGGCTCAGGG" in " ".join(seqs)


def test_trim_low_abund_keeps_pairs(tmp_path):
    infile = copy_test_data("paired.fq", tmp_path)
    runscript("trim-low-abund.py",
              ["-k", "17", "-x", "1e7", "-N", "2", infile],
              in_directory=str(tmp_path))
    assert os.path.exists(infile + ".abundtrim")


# -- abundance-dist --------------------------------------------------------

def test_abundance_dist(tmp_path):
    graph = str(tmp_path / "g.ct")
    hist = str(tmp_path / "h.out")
    infile = get_test_data("test-abund-read-2.fa")
    runscript("load-into-counting.py",
              ["-x", "1e7", "-N", "2", "-k", "17", graph, infile])
    runscript("abundance-dist.py", ["-z", graph, infile, hist])
    lines = [ln.strip() for ln in open(hist) if ln.strip()]
    assert lines[0] == "abundance,count,cumulative,cumulative_fraction"
    assert lines[1] == "1,96,96,0.98", lines[:3]
    assert lines[2] == "1001,2,98,1.0", lines[:3]


def test_abundance_dist_single(tmp_path):
    hist = str(tmp_path / "h.out")
    _, _, err = runscript(
        "abundance-dist-single.py",
        ["-x", "1e7", "-N", "2", "-k", "17", "-z",
         get_test_data("test-abund-read-2.fa"), hist])
    assert "Total number of unique k-mers: 98" in err, err
    lines = [ln.strip() for ln in open(hist) if ln.strip()]
    assert lines[1] == "1,96,96,0.98", lines[:3]


def test_abundance_dist_nobigcount(tmp_path):
    graph = str(tmp_path / "g.ct")
    hist = str(tmp_path / "h.out")
    infile = get_test_data("test-abund-read-2.fa")
    runscript("load-into-counting.py",
              ["-x", "1e7", "-N", "2", "-k", "17", "-b", graph, infile])
    runscript("abundance-dist.py", ["-z", graph, infile, hist])
    lines = [ln.strip() for ln in open(hist) if ln.strip()]
    assert lines[2] == "255,2,98,1.0", lines[:3]


# -- count-median ----------------------------------------------------------

def test_count_median(tmp_path):
    graph = str(tmp_path / "g.ct")
    out = str(tmp_path / "m.out")
    infile = get_test_data("test-abund-read-2.fa")
    runscript("load-into-counting.py",
              ["-x", "1e7", "-N", "2", "-k", "8", graph, infile])
    runscript("count-median.py", [graph, infile, out])
    data = [ln.strip() for ln in open(out)]
    assert "seq,1001,1001.0,0.0,18" in data, data[:5]
    assert "895:1:37:17593:9954/1,1,103.803741455,303.702941895,114" \
        in data, data[:5]


# -- read utilities --------------------------------------------------------

def test_interleave_split_roundtrip(tmp_path):
    in1 = get_test_data("paired.fq.1")
    in2 = get_test_data("paired.fq.2")
    inter = str(tmp_path / "interleaved.fq")
    runscript("interleave-reads.py", [in1, in2, "-o", inter])
    out1 = str(tmp_path / "a.fq")
    out2 = str(tmp_path / "b.fq")
    runscript("split-paired-reads.py",
              ["-1", out1, "-2", out2, inter])
    assert open(out1).read() == open(in1).read()
    assert open(out2).read() == open(in2).read()


def test_extract_paired_reads(tmp_path):
    infile = copy_test_data("paired-mixed.fa", tmp_path)
    runscript("extract-paired-reads.py", [infile],
              in_directory=str(tmp_path))
    pe = infile + ".pe"
    se = infile + ".se"
    assert os.path.exists(pe) and os.path.exists(se)
    n_pe = len(_reads(pe))
    n_se = len(_reads(se))
    assert n_pe % 2 == 0 and n_pe > 0 and n_se > 0


def test_extract_long_sequences(tmp_path):
    out = str(tmp_path / "long.fa")
    runscript("extract-long-sequences.py",
              ["-l", "60", "-o", out,
               get_test_data("paired-mixed.fa")])
    for r in _reads(out):
        assert len(r.sequence) >= 60


def test_fastq_to_fasta(tmp_path):
    out = str(tmp_path / "t.fa")
    _, stdout, err = runscript(
        "fastq-to-fasta.py",
        ["-o", out, get_test_data("test-fastq-reads.fq")])
    recs = _reads(out)
    assert len(recs) == 100
    assert not any("@" in r.name for r in recs)


def test_readstats(tmp_path):
    _, out, _ = runscript("readstats.py",
                          [get_test_data("test-abund-read-2.fa")])
    assert "1001" in out
    assert "test-abund-read-2.fa" in out


def test_sample_reads_randomly_deterministic(tmp_path):
    out1 = str(tmp_path / "s1.fa")
    out2 = str(tmp_path / "s2.fa")
    infile = get_test_data("test-reads.fa")
    runscript("sample-reads-randomly.py",
              ["-N", "10", "-R", "1", "--force_single", "-o", out1,
               infile])
    runscript("sample-reads-randomly.py",
              ["-N", "10", "-R", "1", "--force_single", "-o", out2,
               infile])
    assert open(out1).read() == open(out2).read()
    assert len(_reads(out1)) == 10


# -- graph/partition pipeline ---------------------------------------------

def test_load_graph_writes_tagset(tmp_path):
    base = str(tmp_path / "out")
    _, _, err = runscript("load-graph.py",
                          ["-x", "1e7", "-N", "2", "-k", "20", base,
                           get_test_data("random-20-a.fa")])
    assert os.path.exists(base)
    assert os.path.exists(base + ".tagset")
    assert "Total number of unique k-mers: 3960" in err, err


def test_load_graph_no_tags(tmp_path):
    base = str(tmp_path / "out")
    runscript("load-graph.py",
              ["-x", "1e7", "-N", "2", "-k", "20", "--no-build-tagset",
               base, get_test_data("random-20-a.fa")])
    assert os.path.exists(base)
    assert not os.path.exists(base + ".tagset")


def test_partition_pipeline_stages(tmp_path):
    base = str(tmp_path / "out")
    seq = get_test_data("random-20-a.fa")
    runscript("load-graph.py",
              ["-x", "1e7", "-N", "2", "-k", "20", base, seq])
    runscript("partition-graph.py", [base])
    assert os.path.exists(base + ".subset.0.pmap")
    runscript("merge-partitions.py", ["-k", "20", base])
    assert os.path.exists(base + ".pmap.merged")
    infile = copy_test_data("random-20-a.fa", tmp_path)
    runscript("annotate-partitions.py", ["-k", "20", base, infile],
              in_directory=str(tmp_path))
    part = infile + ".part"
    assert os.path.exists(part)
    names = [r.name for r in _reads(part)]
    parts = {n.rsplit("\t", 1)[-1] for n in names}
    assert len(parts) == 1  # one connected component


def test_do_partition_end_to_end(tmp_path):
    base = str(tmp_path / "out")
    infile = copy_test_data("random-20-a.fa", tmp_path)
    runscript("do-partition.py",
              ["-x", "1e7", "-N", "2", "-k", "20", base, infile],
              in_directory=str(tmp_path))
    assert os.path.exists(infile + ".part")


def test_extract_partitions(tmp_path):
    base = str(tmp_path / "out")
    seq = copy_test_data("random-20-a.fa", tmp_path)
    runscript("do-partition.py",
              ["-x", "1e7", "-N", "2", "-k", "20", base, seq],
              in_directory=str(tmp_path))
    runscript("extract-partitions.py",
              ["extracted", seq + ".part"],
              in_directory=str(tmp_path))
    dist = str(tmp_path / "extracted.dist")
    assert os.path.exists(dist)
    groups = [f for f in os.listdir(str(tmp_path))
              if f.startswith("extracted.group")]
    assert groups


# -- normalize-by-median ---------------------------------------------------

def test_normalize_by_median_basic(tmp_path):
    infile = copy_test_data("test-abund-read-2.fa", tmp_path)
    _, _, err = runscript(
        "normalize-by-median.py",
        ["-C", "1", "-k", "17", "-x", "1e7", "-N", "2", infile],
        in_directory=str(tmp_path))
    out = infile + ".keep"
    assert os.path.exists(out)
    assert len(_reads(out)) == 1


def test_normalize_by_median_C20(tmp_path):
    infile = copy_test_data("test-abund-read-2.fa", tmp_path)
    runscript("normalize-by-median.py",
              ["-C", "20", "-k", "17", "-x", "1e7", "-N", "2", infile],
              in_directory=str(tmp_path))
    assert len(_reads(infile + ".keep")) == 20


def test_normalize_by_median_paired(tmp_path):
    infile = copy_test_data("paired.fq", tmp_path)
    runscript("normalize-by-median.py",
              ["-C", "1", "-k", "17", "-x", "1e7", "-N", "2", "-p",
               infile],
              in_directory=str(tmp_path))
    n = len(_reads(infile + ".keep"))
    assert n % 2 == 0 and n > 0


def test_normalize_by_median_savegraph(tmp_path):
    infile = copy_test_data("test-abund-read-2.fa", tmp_path)
    graph = str(tmp_path / "saved.ct")
    runscript("normalize-by-median.py",
              ["-C", "20", "-k", "17", "-x", "1e7", "-N", "2",
               "-s", graph, infile],
              in_directory=str(tmp_path))
    assert os.path.exists(graph)
    from khmer_tpu import load_countgraph

    g = load_countgraph(graph)
    assert g.ksize() == 17


# -- unique-kmers ----------------------------------------------------------

def test_unique_kmers_value():
    _, _, err = runscript(
        "unique-kmers.py",
        ["-k", "17", "-e", "0.01",
         get_test_data("test-abund-read-2.fa")])
    assert "Estimated number of unique 17-mers" in err, err
    assert "Total estimated number of unique 17-mers: 97" in err, err


def test_unique_kmers_stream_out(tmp_path):
    rep = str(tmp_path / "report.txt")
    runscript("unique-kmers.py",
              ["-k", "20", "-e", "0.01", "-R", rep,
               get_test_data("test-abund-read-2.fa")])
    body = open(rep).read()
    assert "95" in body


# -- stoptags / knots ------------------------------------------------------

def test_filter_stoptags(tmp_path):
    graph = str(tmp_path / "out")
    seq = copy_test_data("random-20-a.fa", tmp_path)
    runscript("load-graph.py",
              ["-x", "1e7", "-N", "2", "-k", "20", graph, seq])
    # build stoptags from the first k-mer of the file
    from khmer_tpu import Nodegraph, load_nodegraph
    from khmer_tpu.core import oxli_io

    first = _reads(seq)[0].sequence[:20]
    ng = load_nodegraph(graph)
    oxli_io.save_stoptags(graph + ".stoptags", 20, {ng.hash(first)})
    runscript("filter-stoptags.py",
              ["-k", "20", graph + ".stoptags", seq],
              in_directory=str(tmp_path))
    assert os.path.exists(seq + ".stopfilt")


def test_make_initial_stoptags(tmp_path):
    base = str(tmp_path / "out")
    seq = copy_test_data("test-reads.fa", tmp_path)
    runscript("load-graph.py",
              ["-x", "1e7", "-N", "2", "-k", "32", base, seq])
    runscript("make-initial-stoptags.py", [base],
              in_directory=str(tmp_path))
    assert os.path.exists(base + ".stoptags")


# -- error paths -----------------------------------------------------------

def test_scripts_reject_missing_input(tmp_path):
    out = str(tmp_path / "o.ct")
    status, _, err = runscript(
        "load-into-counting.py",
        ["-x", "1e5", out, str(tmp_path / "nope.fa")], fail_ok=True)
    assert status != 0
    assert "does not exist" in err, err


def test_abundance_dist_squash(tmp_path):
    graph = str(tmp_path / "g.ct")
    hist = str(tmp_path / "h.out")
    infile = get_test_data("test-abund-read-2.fa")
    runscript("load-into-counting.py",
              ["-x", "1e7", "-N", "2", "-k", "17", graph, infile])
    open(hist, "w").write("junk\n")
    status, _, err = runscript("abundance-dist.py",
                               [graph, infile, hist], fail_ok=True)
    assert status != 0
    assert "squash" in err
    runscript("abundance-dist.py", ["-s", graph, infile, hist])
    assert "abundance" in open(hist).read()
