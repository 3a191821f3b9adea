"""CLI script tests with oracles mined from the reference test suite
(tests/test_scripts.py). The asserted strings/numbers are khmer's own
expected outputs — matching them means bit-exact counting behavior."""

import os

import pytest

from . import script_utils
from .script_utils import get_test_data, runscript


def _make_counting(infilename, tmpdir, SIZE=1e7, N=2, K=20, BIGCOUNT=True):
    args = ['-x', str(SIZE), '-N', str(N), '-k', str(K)]
    if not BIGCOUNT:
        args.append('-b')
    outfile = os.path.join(str(tmpdir), 'out.ct')
    args.extend([outfile, infilename])
    runscript('load-into-counting.py', args)
    return outfile


def test_load_into_counting(tmp_path):
    # reference: tests/test_scripts.py:65-77
    args = ['-x', '1e3', '-N', '2', '-k', '20']
    outfile = str(tmp_path / 'out.ct')
    infile = get_test_data('test-abund-read-2.fa')
    args.extend([outfile, infile])
    (status, out, err) = runscript('load-into-counting.py', args)
    assert 'Total number of unique k-mers: 94' in err, err
    assert os.path.exists(outfile)


def test_load_into_counting_smallcount(tmp_path):
    args = ['-x', '1e3', '-N', '2', '-k', '20', '--small-count']
    outfile = str(tmp_path / 'out.ct')
    infile = get_test_data('test-abund-read-2.fa')
    args.extend([outfile, infile])
    (status, out, err) = runscript('load-into-counting.py', args)
    assert 'Total number of unique k-mers: 94' in err, err
    assert os.path.exists(outfile)


def test_load_into_counting_quiet(tmp_path):
    args = ['-x', '1e3', '-N', '2', '-k', '20', '-q']
    outfile = str(tmp_path / 'out.ct')
    infile = get_test_data('test-abund-read-2.fa')
    args.extend([outfile, infile])
    (status, out, err) = runscript('load-into-counting.py', args)
    assert len(err) == 0, err
    assert os.path.exists(outfile)


def test_load_into_counting_json_summary(tmp_path):
    import json

    args = ['-x', '1e3', '-N', '2', '-k', '20', '-s', 'json']
    outfile = str(tmp_path / 'out.ct')
    infile = get_test_data('test-abund-read-2.fa')
    args.extend([outfile, infile])
    runscript('load-into-counting.py', args)
    summary = json.load(open(outfile + '.info.json'))
    assert summary['num_kmers'] == 94
    assert summary['num_reads'] == 1001


def test_load_into_counting_bad_summary_fmt(tmp_path):
    args = ['-x', '1e3', '-N', '2', '-k', '20', '-s', 'badfmt']
    outfile = str(tmp_path / 'out.ct')
    infile = get_test_data('test-abund-read-2.fa')
    args.extend([outfile, infile])
    (status, out, err) = runscript('load-into-counting.py', args,
                                   fail_ok=True)
    assert status != 0, status
    assert "invalid choice: 'badfmt'" in err, err


def test_abundance_dist(tmp_path):
    # reference: tests/test_scripts.py (exact histogram incl. bigcount)
    infile = script_utils.copy_test_data('test-abund-read-2.fa', tmp_path)
    outfile = str(tmp_path / 'test.dist')
    htfile = _make_counting(infile, tmp_path, K=17)
    args = ['-z', htfile, infile, outfile]
    runscript('abundance-dist.py', args)
    with open(outfile) as fp:
        line = fp.readline().strip()
        assert (line == 'abundance,count,cumulative,cumulative_fraction'), \
            line
        line = fp.readline().strip()
        assert line == '1,96,96,0.98', line
        line = fp.readline().strip()
        assert line == '1001,2,98,1.0', line


def test_abundance_dist_nobigcount(tmp_path):
    infile = script_utils.copy_test_data('test-abund-read-2.fa', tmp_path)
    outfile = str(tmp_path / 'test.dist')
    htfile = _make_counting(infile, tmp_path, K=17, BIGCOUNT=False)
    args = ['-z', '-b', htfile, infile, outfile]
    runscript('abundance-dist.py', args)
    with open(outfile) as fp:
        fp.readline()
        line = fp.readline().strip()
        assert line == '1,96,96,0.98', line
        line = fp.readline().strip()
        assert line == '255,2,98,1.0', line


def test_load_into_counting_ct_roundtrip_is_loadable(tmp_path):
    from khmer_tpu import load_countgraph

    infile = get_test_data('test-abund-read-2.fa')
    htfile = _make_counting(infile, tmp_path, K=17)
    graph = load_countgraph(htfile)
    assert graph.ksize() == 17
    assert graph.get_use_bigcount()
