"""Read-level utility script tests (pairing, interleave, conversion);
behavior mirrored from the reference tests/test_scripts.py."""

import os

from khmer_tpu.io.fastx import FastxParser

from .script_utils import copy_test_data, get_test_data, runscript


def test_extract_paired_reads(tmp_path):
    infile = copy_test_data('paired-mixed.fa', tmp_path)
    runscript('extract-paired-reads.py', [infile],
              in_directory=str(tmp_path))
    outfile1 = str(tmp_path / 'paired-mixed.fa.pe')
    outfile2 = str(tmp_path / 'paired-mixed.fa.se')
    assert os.path.exists(outfile1), outfile1
    assert os.path.exists(outfile2), outfile2
    # matches the reference fixtures paired-mixed.fa.pe / .se
    want_pe = [r.name for r in
               FastxParser(get_test_data('paired-mixed.fa.pe'))]
    got_pe = [r.name for r in FastxParser(outfile1)]
    assert want_pe == got_pe
    want_se = [r.name for r in
               FastxParser(get_test_data('paired-mixed.fa.se'))]
    got_se = [r.name for r in FastxParser(outfile2)]
    assert want_se == got_se


def test_split_paired_reads(tmp_path):
    infile = copy_test_data('paired.fq', tmp_path)
    runscript('split-paired-reads.py', [infile],
              in_directory=str(tmp_path))
    for suffix in ('.1', '.2'):
        out = str(tmp_path / ('paired.fq' + suffix))
        assert os.path.exists(out), out
        want = [r.name for r in
                FastxParser(get_test_data('paired.fq' + suffix))]
        got = [r.name for r in FastxParser(out)]
        assert want == got


def test_split_paired_reads_orphaned(tmp_path):
    infile = copy_test_data('paired-mixed.fq', tmp_path)
    out0 = str(tmp_path / 'orphans.fq')
    runscript('split-paired-reads.py', ['-0', out0, infile],
              in_directory=str(tmp_path))
    assert os.path.exists(out0)
    assert sum(1 for _ in FastxParser(out0)) > 0


def test_interleave_reads(tmp_path):
    in1 = copy_test_data('paired.fq.1', tmp_path)
    in2 = copy_test_data('paired.fq.2', tmp_path)
    out = str(tmp_path / 'out.fq')
    import io

    runscript('interleave-reads.py', [in1, in2, '-o', out],
              in_directory=str(tmp_path))
    want = [r.name for r in FastxParser(get_test_data('paired.fq'))]
    got = [r.name for r in FastxParser(out)]
    assert want == got


def test_fastq_to_fasta(tmp_path):
    infile = copy_test_data('test-fastq-reads.fq', tmp_path)
    out = str(tmp_path / 'out.fa')
    (status, _, err) = runscript('fastq-to-fasta.py',
                                 [infile, '-o', out],
                                 in_directory=str(tmp_path))
    recs = list(FastxParser(out))
    assert all(r.quality is None for r in recs)
    assert len(recs) > 0


def test_extract_long_sequences(tmp_path):
    infile = copy_test_data('paired-mixed.fa', tmp_path)
    out = str(tmp_path / 'long.fa')
    runscript('extract-long-sequences.py',
              [infile, '-l', '10', '-o', out],
              in_directory=str(tmp_path))
    recs = list(FastxParser(out))
    assert all(len(r.sequence) >= 10 for r in recs)


def test_sample_reads_randomly(tmp_path):
    infile = copy_test_data('test-fastq-reads.fq', tmp_path)
    runscript('sample-reads-randomly.py',
              ['-N', '10', '-R', '1', infile],
              in_directory=str(tmp_path))
    out = str(tmp_path / 'test-fastq-reads.fq.subset')
    assert os.path.exists(out)
    recs = list(FastxParser(out))
    # the reservoir samples 10 bundles; pairs contribute two records
    assert 10 <= len(recs) <= 20


def test_readstats(tmp_path):
    infile = copy_test_data('test-abund-read-3.fa', tmp_path)
    (status, out, err) = runscript('readstats.py', [infile],
                                   in_directory=str(tmp_path))
    assert 'average length' in out, out


def test_readstats_csv(tmp_path):
    infile = copy_test_data('test-abund-read-3.fa', tmp_path)
    (status, out, err) = runscript('readstats.py', ['--csv', infile],
                                   in_directory=str(tmp_path))
    assert 'bp,seqs,avg_len,filename' in out, out
