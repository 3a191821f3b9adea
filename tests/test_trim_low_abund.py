"""trim-low-abund CLI tests; oracles from the reference
tests/test_scripts.py:2316-2480."""

import os

from khmer_tpu.io.fastx import FastxParser

from .script_utils import copy_test_data, runscript


def test_trim_low_abund_1(tmp_path):
    infile = copy_test_data('test-abund-read-2.fa', tmp_path)
    args = ["-k", "17", "-x", "1e7", "-N", "2", infile]
    runscript('trim-low-abund.py', args, in_directory=str(tmp_path))
    outfile = infile + '.abundtrim'
    assert os.path.exists(outfile), outfile
    seqs = set(r.sequence for r in FastxParser(outfile))
    assert len(seqs) == 1, seqs
    assert 'GGTTGACGGGGCTCAGGG' in seqs


def test_trim_low_abund_1_duplicate_filename_err(tmp_path):
    infile = copy_test_data('test-abund-read-2.fa', tmp_path)
    args = ["-k", "17", "-x", "1e7", "-N", "2", '-C', '1', infile,
            infile]
    (status, out, err) = runscript('trim-low-abund.py', args,
                                   in_directory=str(tmp_path),
                                   fail_ok=True)
    assert status == 1


def test_trim_low_abund_2(tmp_path):
    os.makedirs(str(tmp_path / 'two'))
    infile = copy_test_data('test-abund-read-2.fa', tmp_path)
    infile2 = copy_test_data('test-abund-read-2.fa', tmp_path / 'two')
    args = ["-k", "17", "-x", "1e7", "-N", "2", '-C', '1', infile,
            infile2]
    runscript('trim-low-abund.py', args, in_directory=str(tmp_path))
    outfile = infile + '.abundtrim'
    assert os.path.exists(outfile), outfile
    seqs = set(r.sequence for r in FastxParser(outfile))
    assert len(seqs) == 2, seqs
    assert 'GGTTGACGGGGCTCAGGG' in seqs


def test_trim_low_abund_3_fq_retained(tmp_path):
    os.makedirs(str(tmp_path / 'two'))
    infile = copy_test_data('test-abund-read-2.fq', tmp_path)
    infile2 = copy_test_data('test-abund-read-2.fq', tmp_path / 'two')
    args = ["-k", "17", "-x", "1e7", "-N", "2", '-C', '1', infile,
            infile2]
    runscript('trim-low-abund.py', args, in_directory=str(tmp_path))
    outfile = infile + '.abundtrim'
    seqs = set(r.sequence for r in FastxParser(outfile))
    assert len(seqs) == 2, seqs
    assert 'GGTTGACGGGGCTCAGGG' in seqs
    quals = set(r.quality for r in FastxParser(outfile))
    assert len(quals) == 2, quals
    assert '##################' in quals


def test_trim_low_abund_4_retain_low_abund(tmp_path):
    infile = copy_test_data('test-abund-read-2.fa', tmp_path)
    args = ["-k", "17", "-x", "1e7", "-N", "2", '-V', infile]
    runscript('trim-low-abund.py', args, in_directory=str(tmp_path))
    seqs = set(r.sequence for r in FastxParser(infile + '.abundtrim'))
    assert len(seqs) == 2, seqs
    assert 'GGTTGACGGGGCTCAGGG' in seqs


def test_trim_low_abund_5_trim_high_abund(tmp_path):
    infile = copy_test_data('test-abund-read-3.fa', tmp_path)
    args = ["-k", "17", "-x", "1e7", "-N", "2", '-V', infile]
    runscript('trim-low-abund.py', args, in_directory=str(tmp_path))
    seqs = set(r.sequence for r in FastxParser(infile + '.abundtrim'))
    assert len(seqs) == 2, seqs
    assert 'GGTTGACGGGGCTCAGGGGGCGGCTGACTCCGAGAGACAGC' in seqs


def test_trim_low_abund_6_trim_high_abund_Z(tmp_path):
    infile = copy_test_data('test-abund-read-3.fa', tmp_path)
    args = ["-k", "17", "-x", "1e7", "-N", "2", '-V', '-Z', '25', infile]
    runscript('trim-low-abund.py', args, in_directory=str(tmp_path))
    seqs = set(r.sequence for r in FastxParser(infile + '.abundtrim'))
    assert len(seqs) == 2, seqs
    badseq = ('GGTTGACGGGGCTCAGGGGGCGGCTGACTCCGAGAGACAGCgtgCCGCAGCTGTCGTC'
              'AGGGGATTTCCGGGCGG')
    assert badseq in seqs


def test_trim_low_abund_keep_paired(tmp_path):
    infile = copy_test_data('test-abund-read-2.paired.fq', tmp_path)
    args = ["-k", "17", "-x", "1e7", "-N", "2", "-V", infile]
    runscript('trim-low-abund.py', args, in_directory=str(tmp_path))
    seqs = [r.name for r in FastxParser(infile + '.abundtrim')]
    assert seqs[-2:] == ['pair/1', 'pair/2'], seqs


def test_trim_low_abund_diginorm(tmp_path):
    infile = copy_test_data('test-abund-read-2.fa', tmp_path)
    args = ["-k", "17", "-x", "1e7", "-N", "2", '--diginorm',
            '--diginorm-coverage', '5', '-C', '0', infile]
    runscript('trim-low-abund.py', args, in_directory=str(tmp_path))
    # diginorm mode eliminates most of the 1001 duplicate reads
    n = sum(1 for _ in FastxParser(infile + '.abundtrim'))
    assert n < 20, n


def test_scan_pass1_matches_host_engine(tmp_path):
    """The device-scan pass-1 must reproduce the host delta-map engine
    read-for-read (emitted, saved-for-pass2, and graph state),
    including --diginorm mode."""
    import io

    import numpy as np

    from khmer_tpu import Countgraph
    from khmer_tpu.cli.trim_low_abund import Trimmer
    from khmer_tpu.io.fastx import Record

    rng = np.random.default_rng(31)
    base = ["".join("ACGT"[b] for b in rng.integers(0, 4, 80))
            for _ in range(10)]
    reads = []
    for i in range(800):
        src = base[rng.integers(0, len(base))]
        s = rng.integers(0, len(src) - 50)
        seq = list(src[s:s + 50])
        if rng.random() < 0.3:  # sprinkle errors -> low-abund k-mers
            seq[rng.integers(0, len(seq))] = "ACGT"[rng.integers(0, 4)]
        reads.append(Record(name="r%d" % i, sequence="".join(seq)))

    def reader():
        for i, r in enumerate(reads):
            yield i, False, r, None

    def run(force_host):
        g = Countgraph(20, 8192, 3)
        tr = Trimmer(g, True, 2, 5)
        tr.set_diginorm(8)
        saver = io.StringIO()
        if force_host:
            emitted = []
            for w in tr._windows(reader()):
                emitted.extend(tr._pass1_host_window(w, saver))
        else:
            emitted = list(tr.pass1(reader(), saver))
            tr.sync()
        return (g, [(r.name, r.sequence) for r in emitted],
                saver.getvalue(), tr.trimmed_reads, tr.n_saved)

    g1, em1, saved1, t1, s1 = run(True)
    g2, em2, saved2, t2, s2 = run(False)
    assert em1 == em2
    assert saved1 == saved2
    assert (t1, s1) == (t2, s2)
    assert g1.n_unique_kmers() == g2.n_unique_kmers()
    for a, b in zip(g1.tables, g2.tables):
        assert (np.asarray(a) == np.asarray(b)).all()
