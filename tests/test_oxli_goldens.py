"""Binary cross-compat against reference-WRITTEN golden files.

Every loadable binary the reference ships in tests/test-data/ is loaded
here, its decoded contents cross-checked against an independent numpy
decode of the raw bytes (per doc/dev/binary-file-formats.rst:44-120),
and re-saved byte-identically. Version/type rejection mirrors
src/oxli/storage.cc:179-216 and the reference tests that exercise it
(tests/test_countgraph.py:1115-1160, tests/test_nodegraph.py:795-900,
tests/test_labelhash.py:503-530).
"""

import gzip
import struct

import numpy as np
import pytest

from khmer_tpu import Countgraph, Nodegraph
from khmer_tpu.core import oxli_io
from tests.conftest import reference_file


def _raw(path):
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    return data


# --------------------------------------------------------------------------
# normC20k20.ct — a Countgraph written by khmer itself
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def normct():
    return Countgraph.load(reference_file("normC20k20.ct"))


def test_normct_header_fields(normct):
    g = normct
    assert g.ksize() == 20
    assert len(g._primes) == 4
    # spec: header = OXLI ver=4 type=1 bigcount ksize n_tables occupied
    raw = _raw(reference_file("normC20k20.ct"))
    assert raw[:4] == b"OXLI" and raw[4] == 4 and raw[5] == 1
    use_bigcount = raw[6]
    ksize, n_tables, occupied = struct.unpack("<IBQ", raw[7:20])
    assert ksize == 20 and n_tables == 4
    assert bool(use_bigcount) == g._use_bigcount
    assert g.n_occupied() == occupied
    # table sizes decoded from the file match the loaded primes
    off = 20
    for p in g._primes:
        (tablesize,) = struct.unpack("<Q", raw[off:off + 8])
        assert tablesize == p
        off += 8 + tablesize


def test_normct_counts_match_raw_bytes(normct):
    """get() must equal min over tables of raw file bytes at hash%size.

    The independent decode uses only struct/numpy on the file written
    by the reference C++ (storage.cc:99-137), so this cross-checks the
    loader AND the device gather path.
    """
    g = normct
    raw = _raw(reference_file("normC20k20.ct"))
    tables = []
    off = 20
    for _ in range(4):
        (tablesize,) = struct.unpack("<Q", raw[off:off + 8])
        off += 8
        tables.append(np.frombuffer(raw[off:off + tablesize], np.uint8))
        off += tablesize
    from khmer_tpu.ops.hashing import forward_hash

    checked = 0
    from khmer_tpu.io.fastx import FastxParser

    for rec in FastxParser(reference_file("random-20-a.fa")):
        for s in range(0, len(rec.cleaned_seq) - 20 + 1, 7):
            kmer = rec.cleaned_seq[s:s + 20]
            h = forward_hash(kmer, 20)
            expect = min(int(t[h % len(t)]) for t in tables)
            assert g.get(kmer) == expect
            checked += 1
            if checked >= 50:
                return
    assert checked > 0


def test_normct_resave_byte_identical(normct, tmp_path):
    out = str(tmp_path / "resaved.ct")
    normct.save(out)
    assert _raw(out) == _raw(reference_file("normC20k20.ct"))


def test_normct_loadgraph_script(tmp_path):
    """normalize-by-median --loadgraph normC20k20.ct runs clean
    (mirrors tests/test_normalize_by_median.py:49-57)."""
    from tests.script_utils import runscript

    infile = reference_file("paired-mixed.fa.pe")
    outfile = str(tmp_path / "paired-mixed.fa.pe.keep")
    status, out, err = runscript(
        "normalize-by-median.py",
        ["--loadgraph", reference_file("normC20k20.ct"), "-o", outfile,
         infile])
    assert status == 0, (out, err)
    import os

    assert os.path.exists(outfile)


def test_normct_extract_info():
    info = oxli_io.extract_countgraph_info(reference_file("normC20k20.ct"))
    assert (info.n_tables, info.ksize, info.version, info.ht_type) \
        == (4, 20, 4, 1)
    # reference rounds table_size to the nearest 100
    # (khmer/__init__.py:177); true size is the prime 999983
    assert info.table_size == 1000000
    assert info.use_bigcount == 0 and info.n_occupied == 0


# --------------------------------------------------------------------------
# goodversion/badversion table files
# --------------------------------------------------------------------------


def test_good_nodegraph_loads():
    g = Nodegraph.load(reference_file("goodversion-k12.ht"))
    assert g.ksize() == 12


def test_good_nodegraph_gz_loads():
    g = Nodegraph.load(reference_file("goodversion-k12.ht.gz"))
    assert g.ksize() == 12


def test_good_nodegraph_resave_byte_identical(tmp_path):
    g = Nodegraph.load(reference_file("goodversion-k12.ht"))
    out = str(tmp_path / "resaved.ht")
    g.save(out)
    assert _raw(out) == _raw(reference_file("goodversion-k12.ht"))


def test_bad_version_countgraph_rejected():
    # badversion-k12.ct is a pre-signature (v3) file: the reference
    # rejects it at the signature check (storage.cc:189-195)
    with pytest.raises(OSError, match="signature"):
        Countgraph.load(reference_file("badversion-k12.ct"))


def test_bad_version_nodegraph_rejected():
    with pytest.raises(OSError, match="signature|file format version"):
        Nodegraph.load(reference_file("badversion-k12.ht"))


def test_type_mismatch_ht_as_countgraph_rejected():
    # storage.cc:202-206: "Incorrect file format type"
    with pytest.raises(OSError, match="file format type"):
        Countgraph.load(reference_file("goodversion-k12.ht"))


def test_type_mismatch_ct_as_nodegraph_rejected():
    with pytest.raises(OSError, match="file format type"):
        Nodegraph.load(reference_file("normC20k20.ct"))


# --------------------------------------------------------------------------
# tagset / stoptags goldens
# --------------------------------------------------------------------------


def test_good_tagset_loads_and_resaves(tmp_path):
    path = reference_file("goodversion-k32.tagset")
    tags, density = oxli_io.load_tagset(path, expect_ksize=32)
    raw = _raw(path)
    (n_tags,) = struct.unpack("<Q", raw[10:18])
    assert len(tags) == n_tags
    # independent decode of the sorted tag payload
    expect = set(np.frombuffer(raw[22:22 + 8 * n_tags],
                               np.uint64).tolist())
    assert tags == expect
    out = str(tmp_path / "resaved.tagset")
    oxli_io.save_tagset(out, 32, tags, density)
    assert _raw(out) == raw


def test_good_tagset_via_nodegraph():
    g = Nodegraph(32, 64, 2)
    g.load_tagset(reference_file("goodversion-k32.tagset"))
    assert g.n_tags() == 2


def test_bad_tagset_rejected():
    with pytest.raises(OSError, match="file format version"):
        oxli_io.load_tagset(reference_file("badversion-k32.tagset"))


def test_tagset_wrong_ksize_rejected():
    g = Nodegraph(20, 64, 2)
    with pytest.raises(OSError):
        g.load_tagset(reference_file("goodversion-k32.tagset"))


def test_good_stoptags_loads_and_resaves(tmp_path):
    path = reference_file("goodversion-k32.stoptags")
    tags = oxli_io.load_stoptags(path, expect_ksize=32)
    raw = _raw(path)
    (n_tags,) = struct.unpack("<Q", raw[10:18])
    assert len(tags) == n_tags == 167
    expect = set(np.frombuffer(raw[18:18 + 8 * n_tags],
                               np.uint64).tolist())
    assert tags == expect
    out = str(tmp_path / "resaved.stoptags")
    oxli_io.save_stoptags(out, 32, tags)
    assert _raw(out) == raw


def test_bad_stoptags_rejected():
    with pytest.raises(OSError, match="signature|file format version"):
        oxli_io.load_stoptags(reference_file("badversion-k32.stoptags"))


# --------------------------------------------------------------------------
# spec conformance of fresh saves (doc/dev/binary-file-formats.rst)
# --------------------------------------------------------------------------


def test_fresh_countgraph_save_layout(tmp_path):
    g = Countgraph(5, 13, 2)
    g.consume("ACGTTA")
    out = str(tmp_path / "tiny.ct")
    g.save(out)
    raw = _raw(out)
    assert raw[:4] == b"OXLI"
    assert raw[4] == 4 and raw[5] == 1  # version, SAVED_COUNTING_HT
    use_bigcount = raw[6]
    ksize, n_tables, occupied = struct.unpack("<IBQ", raw[7:20])
    assert (bool(use_bigcount), ksize, n_tables) \
        == (g._use_bigcount, 5, 2)
    assert occupied == g.n_occupied()
    off = 20
    for p in g._primes:
        (tablesize,) = struct.unpack("<Q", raw[off:off + 8])
        assert tablesize == p
        off += 8 + tablesize
    (n_bigcounts,) = struct.unpack("<Q", raw[off:off + 8])
    assert n_bigcounts == 0
    assert off + 8 == len(raw)


def test_fresh_nodegraph_save_layout(tmp_path):
    g = Nodegraph(5, 13, 2)
    g.consume("ACGTTA")
    out = str(tmp_path / "tiny.pt")
    g.save(out)
    raw = _raw(out)
    assert raw[:4] == b"OXLI" and raw[4] == 4 and raw[5] == 2
    ksize, n_tables, occupied = struct.unpack("<IBQ", raw[6:19])
    assert (ksize, n_tables) == (5, 2)
    off = 19
    for p in g._primes:
        (tablesize,) = struct.unpack("<Q", raw[off:off + 8])
        assert tablesize == p
        off += 8 + tablesize // 8 + 1
    assert off == len(raw)


def test_gz_roundtrip_matches_plain(tmp_path):
    g = Countgraph(9, 101, 3)
    g.consume("ACGTACGTACGTTGCA")
    plain = str(tmp_path / "t.ct")
    gzpath = str(tmp_path / "t.ct.gz")
    g.save(plain)
    g.save(gzpath)
    with open(gzpath, "rb") as f:
        assert f.read(2) == b"\x1f\x8b"
    assert _raw(gzpath) == _raw(plain)
    g2 = Countgraph.load(gzpath)
    assert g2.get("ACGTACGTA") == g.get("ACGTACGTA")
