"""Counting quotient filter: structure, parity, and reference interop.

Golden fixtures in tests/golden/ were produced by the REFERENCE CQF
(third-party/cqf/gqf.c compiled unmodified; generator kept at
tests/golden/gen_qf_fixture.c) writing the exact bytes
QFStorage::save emits (src/oxli/storage.cc:919-955).
"""

import io
import os

import numpy as np
import pytest

from khmer_tpu.core.qf import (QuotientFilter, _encode_counters,
                               _decode_run)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def load_golden(base):
    golden = {}
    hdr = {}
    with open(os.path.join(GOLDEN, base + ".counts")) as f:
        for line in f:
            if line.startswith("#"):
                for kv in line[1:].split():
                    k, v = kv.split("=")
                    hdr[k] = int(v)
                continue
            k, c = line.split()
            golden[int(k)] = int(c)
    with open(os.path.join(GOLDEN, base + ".qf"), "rb") as f:
        raw = f.read()
    return golden, hdr, raw


# -- counter codec --------------------------------------------------------

@pytest.mark.parametrize("r,c,expected", [
    (7, 1, [7]),
    (7, 2, [7, 7]),
    (7, 3, [7, 0, 7]),
    (0, 1, [0]),
    (0, 2, [0, 0]),
    (0, 3, [0, 0, 0]),
    (0, 4, [0, 1, 0, 0]),      # digits base 255, c-4=0 -> digit 1
    (7, 4, [7, 2, 7]),         # c-3=1 -> digit 2 (1+1, <r so no skip)
    (3, 10, [3, 0, 9, 3]),     # c-3=7 -> digit 8 -> >=3 so 9, marker 0
])
def test_encode_counter_cases(r, c, expected):
    flat, lens = _encode_counters([r], [c])
    assert flat.tolist() == expected
    assert lens.tolist() == [len(expected)]


def test_codec_roundtrip_exhaustive():
    for r in (0, 1, 2, 3, 254, 255):
        for c in list(range(1, 40)) + [253, 254, 255, 256, 300,
                                       65535, 10**6]:
            flat, lens = _encode_counters([r], [c])
            decoded = _decode_run(flat)
            assert decoded == [(r, c)], (r, c, flat.tolist(), decoded)


def test_codec_run_roundtrip_random():
    rng = np.random.default_rng(3)
    for _ in range(200):
        n = rng.integers(1, 12)
        rems = np.sort(rng.choice(256, size=n, replace=False))
        counts = rng.integers(1, 600, size=n)
        flat, lens = _encode_counters(rems, counts)
        assert _decode_run(flat) == list(zip(rems.tolist(),
                                             counts.tolist()))


# -- golden interop -------------------------------------------------------

@pytest.mark.parametrize("base", ["qf_k20_s10", "qf_k20_s6"])
def test_reference_qf_loads_with_exact_counts(base):
    golden, hdr, raw = load_golden(base)
    f = io.BytesIO(raw)
    assert f.read(6) == b"OXLI\x04\x08"
    qf, ksize = QuotientFilter.load(f)
    assert ksize == 20
    assert dict(qf.items()) == golden
    # absent keys are zero
    for k in range(0, hdr["range"], max(1, hdr["range"] // 29)):
        if k not in golden:
            assert qf.count(k) == 0


@pytest.mark.parametrize("base", ["qf_k20_s10", "qf_k20_s6"])
def test_rank_select_walk_matches_golden(base):
    """get_count through the real packed structure (offset -> rank ->
    select -> run decode), not the key arrays."""
    golden, hdr, raw = load_golden(base)
    qf, _ = QuotientFilter.load(io.BytesIO(raw[6:]))
    rng = np.random.default_rng(0)
    keys = sorted(golden)
    for k in rng.choice(len(keys), size=min(80, len(keys)),
                        replace=False):
        key = keys[int(k)]
        assert qf._query_structure(key) == golden[key]


@pytest.mark.parametrize("base", ["qf_k20_s10", "qf_k20_s6"])
def test_loaded_reference_file_resaves_byte_identical(base):
    golden, hdr, raw = load_golden(base)
    qf, ksize = QuotientFilter.load(io.BytesIO(raw[6:]))
    out = io.BytesIO()
    out.write(b"OXLI\x04\x08")
    qf.save(out, ksize)
    assert out.getvalue() == raw


@pytest.mark.parametrize("base", ["qf_k20_s10", "qf_k20_s6"])
def test_canonical_rebuild_matches_reference_blocks(base):
    """Inserting the same key multiset from scratch reproduces the
    reference's qfblock bytes exactly: slots, occupieds, runends,
    offsets, and noccupied (gqf's incremental layout is canonical)."""
    golden, hdr, raw = load_golden(base)
    ref, _ = QuotientFilter.load(io.BytesIO(raw[6:]))
    qf = QuotientFilter(hdr["nslots"])
    items = list(golden.items())
    np.random.default_rng(1).shuffle(items)
    for k, c in items:
        qf.insert(k, c)
    qf._flush()
    np.testing.assert_array_equal(qf.slots, ref.slots)
    np.testing.assert_array_equal(qf.occupieds, ref.occupieds)
    np.testing.assert_array_equal(qf.runends, ref.runends)
    np.testing.assert_array_equal(qf.offsets, ref.offsets)
    assert qf.noccupied == hdr["noccupied"]
    assert qf.nelts == hdr["nelts"]
    # gqf's ndistinct_elts undercounts (insert1 skips the increment
    # when the home slot is taken by spill); ours is the true count
    assert len(qf._keys) >= hdr["ndistinct"]


def test_insert_then_count_interleaved():
    qf = QuotientFilter(256)
    rng = np.random.default_rng(5)
    keyspace = rng.integers(0, qf.range, size=180)  # fits 256 slots
    truth = {}
    for _ in range(500):
        k = int(keyspace[rng.integers(0, len(keyspace))])
        truth[k] = truth.get(k, 0) + 1
        qf.insert(k)
        probe = int(keyspace[rng.integers(0, len(keyspace))])
        assert qf.count(probe) == truth.get(probe, 0)
    assert qf.n_unique == len(truth)
    assert qf.nelts == 500


def test_insert_many_matches_sequential():
    rng = np.random.default_rng(9)
    # ~700 distinct keys, many repeats (count encodings eat ~3.5
    # slots/key at these counts — needs the 4096-slot filter)
    hashes = rng.integers(0, 2**63, size=700, dtype=np.uint64)
    hashes = rng.choice(hashes, size=4000)
    a = QuotientFilter(4096)
    a.insert_many(hashes)
    b = QuotientFilter(4096)
    for h in hashes:
        b.insert(int(h))
    b._flush()
    a._flush()
    np.testing.assert_array_equal(a.slots, b.slots)
    assert dict(a.items()) == dict(b.items())


def test_overfull_filter_raises():
    qf = QuotientFilter(64)   # 144 usable slots (192 after padding)
    with pytest.raises(OverflowError, match="overfull"):
        for q in range(64):
            for r in range(4):   # 256 distinct keys > 192 slots
                qf.insert((q << 8) | r)
        qf._flush()


def test_offset_spill_across_blocks():
    """A long run crossing a 64-slot block boundary must set the next
    block's offset byte (gqf block_offset invariant)."""
    qf = QuotientFilter(256)
    # quotient 60 with 20 distinct remainders: run occupies 60..79
    for r in range(20):
        qf.insert((60 << 8) | r)
    qf._flush()
    assert qf.offsets[1] == 80 - 64  # run_end(63)=79 -> offset 16
    # every key still readable through the structure
    for r in range(20):
        assert qf._query_structure((60 << 8) | r) == 1


def test_dense_reference_file_ndistinct_drift_quantified():
    """gqf's ndistinct_elts undercounts on dense filters (its insert1
    path skips the increment when the home slot holds an earlier run's
    spill).  On the dense k20_s10 golden the reference header says 482
    distinct keys while the filter actually holds 605 — a 20.3%
    undercount.  This module reports the TRUE count for its own
    filters, and preserves the reference's (buggy) header on a loaded
    file so a resave stays byte-identical (core/qf.py:35-41)."""
    golden, hdr, raw = load_golden("qf_k20_s10")
    true_distinct = len(golden)
    ref_reported = hdr["ndistinct"]
    assert ref_reported < true_distinct           # the gqf undercount
    drift = (true_distinct - ref_reported) / true_distinct
    assert 0.15 < drift < 0.25, drift             # pin the magnitude

    # our own build of the same key multiset reports the true count
    qf = QuotientFilter(hdr["nslots"])
    for k, c in golden.items():
        for _ in range(c):
            qf.insert(k)
    assert qf.n_unique == true_distinct

    # a loaded reference file keeps the reference's header value
    # (byte-identical resave contract)
    import io as _io

    loaded, _ks = QuotientFilter.load(_io.BytesIO(raw[6:]))
    buf = _io.BytesIO()
    loaded.save(buf, 20)
    assert buf.getvalue() == raw[6:]
