"""normalize-by-median CLI tests; oracles from the reference
tests/test_normalize_by_median.py."""

import os

from khmer_tpu.io.fastx import FastxParser

from .script_utils import copy_test_data, runscript


def _seqs(path):
    return [r.sequence for r in FastxParser(path)]


def test_normalize_by_median(tmp_path):
    # reference :87-105
    infile = copy_test_data('test-abund-read-2.fa', tmp_path)
    args = ['-C', '1', '-k', '17', infile]
    (_, _, err) = runscript('normalize-by-median.py', args,
                            in_directory=str(tmp_path))
    assert 'Total number of unique k-mers: 98' in err, err
    outfile = infile + '.keep'
    assert os.path.exists(outfile), outfile
    seqs = _seqs(outfile)
    assert len(seqs) == 1, seqs
    assert seqs[0].startswith('GGTTGACGGGGCTCAGGGGG'), seqs
    assert "I/O Errors" not in err


def test_normalize_by_median_2(tmp_path):
    # reference :422-438
    infile = copy_test_data('test-abund-read-2.fa', tmp_path)
    args = ['-C', '2', '-k', '17', infile]
    runscript('normalize-by-median.py', args, in_directory=str(tmp_path))
    seqs = _seqs(infile + '.keep')
    assert len(seqs) == 2, seqs
    assert seqs[0].startswith('GGTTGACGGGGCTCAGGGGG'), seqs
    assert seqs[1] == 'GGTTGACGGGGCTCAGGG', seqs


def test_normalize_by_median_paired(tmp_path):
    # reference :441-458
    infile = copy_test_data('test-abund-read-paired.fa', tmp_path)
    args = ['-C', '1', '-p', '-k', '17', infile]
    runscript('normalize-by-median.py', args, in_directory=str(tmp_path))
    seqs = _seqs(infile + '.keep')
    assert len(seqs) == 2, seqs
    assert seqs[0].startswith('GGTTGACGGGGCTCAGGGGG'), seqs
    assert seqs[1].startswith('GGTTGACGGGGCTCAGGG'), seqs


def test_normalize_by_median_paired_fq(tmp_path):
    # reference :460-484
    infile = copy_test_data('test-abund-read-paired.fq', tmp_path)
    args = ['-C', '20', '-p', '-k', '17', infile]
    runscript('normalize-by-median.py', args, in_directory=str(tmp_path))
    outfile = infile + '.keep'
    seqs = _seqs(outfile)
    assert len(seqs) == 6, len(seqs)
    assert seqs[0].startswith('GGTTGACGGGGCTCAGGGGG'), seqs
    assert seqs[1].startswith('GGTTGACGGGGCTCAGGG'), seqs
    names = [r.name for r in FastxParser(outfile)]
    assert len(names) == 6, names
    assert '895:1:37:17593:9954 1::FOO' in names, names
    assert '895:1:37:17593:9954 2::FOO' in names, names


def test_normalize_by_median_impaired(tmp_path):
    # reference :486-497
    infile = copy_test_data('test-abund-read-impaired.fa', tmp_path)
    args = ['-C', '1', '-p', '-k', '17', infile]
    status, _, err = runscript('normalize-by-median.py', args,
                               in_directory=str(tmp_path), fail_ok=True)
    assert status != 0
    assert 'ERROR: Unpaired reads ' in err, err


def test_normalize_by_median_cutoff_range(tmp_path):
    # reference :516-529
    infile = copy_test_data('test-abund-read-2.fa', tmp_path)
    hashfile = str(tmp_path / 'test-out.ct')
    args = ['-C', '256', '-k 8', '--savegraph', hashfile, infile]
    (status, out, err) = runscript('normalize-by-median.py', args,
                                   in_directory=str(tmp_path),
                                   fail_ok=True)
    assert status == 1, (out, err)
    assert "ERROR: khmer only supports 0 <= cutoff < 256" in err


def test_diginorm_basic_functionality_1(tmp_path):
    # reference :637-661
    infile = copy_test_data('dn-test-all-paired-all-keep.fa', tmp_path)
    args = ['-C', '1', '-p', '-k', '15', infile]
    runscript('normalize-by-median.py', args, in_directory=str(tmp_path))
    seqs = set(r.name for r in FastxParser(infile + '.keep'))
    assert seqs == set(['a/1', 'a/2', 'b/1', 'b/2',
                        'c/1', 'c/2', 'd/1', 'd/2']), seqs


def test_diginorm_basic_functionality_2(tmp_path):
    # reference :663-689
    infile = copy_test_data('dn-test-all-paired-all-keep.fa', tmp_path)
    args = ['-C', '1', '--force_single', '-k', '15', infile]
    runscript('normalize-by-median.py', args, in_directory=str(tmp_path))
    seqs = set(r.name for r in FastxParser(infile + '.keep'))
    assert seqs == set(['a/1', 'a/2', 'b/2', 'c/1', 'd/2']), seqs


def test_normalize_by_median_empty_file(tmp_path):
    # reference :74-84
    infile = copy_test_data('empty-file', tmp_path)
    args = ['-C', '1', '-k', '17', infile]
    status, out, err = runscript('normalize-by-median.py', args,
                                 in_directory=str(tmp_path))
    # reference: warn-only + per-file SKIPPED, run succeeds
    assert 'WARNING:' in err, err
    assert 'is empty' in err, err
    assert 'SKIPPED' in err, err


def test_normalize_by_median_savegraph(tmp_path):
    from khmer_tpu import load_countgraph

    infile = copy_test_data('test-abund-read-2.fa', tmp_path)
    ct = str(tmp_path / 'saved.ct')
    args = ['-C', '1', '-k', '17', '-s', ct, infile]
    runscript('normalize-by-median.py', args, in_directory=str(tmp_path))
    g = load_countgraph(ct)
    assert g.ksize() == 17


def test_scan_normalizer_matches_delta_engine():
    """The device-scan diginorm engine must reproduce the established
    host-exact delta-map engine decision-for-decision, including the
    final table state and n_unique accounting."""
    import numpy as np
    from khmer_tpu import Countgraph
    from khmer_tpu.core.diginorm import BatchedNormalizer
    from khmer_tpu.core.diginorm_scan import ScanNormalizer

    class Rec:
        def __init__(self, seq):
            self.name = "r"
            self.sequence = seq
            self.cleaned_seq = seq
            self.quality = None

    rng = np.random.default_rng(21)
    base = ["".join("ACGT"[b] for b in rng.integers(0, 4, 60))
            for _ in range(12)]
    reads = []
    for i in range(600):
        src = base[rng.integers(0, len(base))]
        s = rng.integers(0, len(src) - 40)
        reads.append(src[s:s + 40])
    # bundle pairs and singletons
    bundles = []
    i = 0
    while i < len(reads):
        if rng.random() < 0.5 and i + 1 < len(reads):
            bundles.append([Rec(reads[i]), Rec(reads[i + 1])])
            i += 2
        else:
            bundles.append([Rec(reads[i])])
            i += 1

    g1 = Countgraph(20, 4096, 3)
    ref = BatchedNormalizer(g1, 5, window=64)
    g2 = Countgraph(20, 4096, 3)
    scan = ScanNormalizer(g2, 5, window=64)

    for s in range(0, len(bundles), 64):
        w = bundles[s:s + 64]
        want = ref.process_window(w)
        got = scan.process_window(w)
        assert [len(x) for x in got] == [len(x) for x in want]
    scan.finalize()
    assert g2.n_unique_kmers() == g1.n_unique_kmers()
    for a, b in zip(g2.tables, g1.tables):
        assert (np.asarray(a) == np.asarray(b)).all()
