"""Blocked-layout false-positive-rate properties.

The blocked Count-Min (core/blocked.py) trades the reference's
independent prime tables for one 128-byte block per k-mer. These
property tests pin its collision behavior: the measured FP rate on
random absent keys must track the (occupancy/subtable)^4 model that
the CLI FP guard uses (cli/args.py calc_expected_collisions over
hashsizes()), within the slack expected of a blocked sketch.
"""

import numpy as np
import pytest

from khmer_tpu.core.blocked import (BlockedCounttable, LANES, QUART,
                                    SUB, mix64)


def _fill(table, n_keys, seed=0):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 2**63, n_keys, dtype=np.uint64)
    table._commit_hashes(keys)
    return np.unique(keys)


def test_fp_rate_tracks_power4_model():
    t = BlockedCounttable(20, 1 << 16, 4)   # 2039 blocks, 65k lanes/sub
    present = _fill(t, 25000)               # ~32% sub-table occupancy
    # occupancy per sub-table
    occ = [float(np.mean(np.asarray(t.tables[0])[:, q * QUART:(q + 1)
                                                 * QUART] > 0))
           for q in range(SUB)]
    model = float(np.prod(occ))
    assert model > 1e-3                      # measurable regime
    rng = np.random.default_rng(9)
    probes = rng.integers(0, 2**63, 200000, dtype=np.uint64)
    probes = np.setdiff1d(probes, present)
    counts = t.get_counts_for_hashes(probes)
    fp = float(np.mean(counts > 0))
    # blocked sketches sit slightly above the independent-table model
    # (within-block offset reuse), but must stay the same order
    assert fp <= 3.0 * model, (fp, model, occ)
    assert fp >= 0.3 * model, (fp, model)


def test_no_false_negatives():
    t = BlockedCounttable(20, 1 << 15, 4)
    present = _fill(t, 1500, seed=3)
    counts = t.get_counts_for_hashes(present)
    assert (counts >= 1).all()


def test_fp_guard_hashsizes_geometry():
    """hashsizes() reports 4 sub-tables of nblocks*32 counters so the
    standard (n_unique / size)^n_tables guard math is meaningful."""
    t = BlockedCounttable(20, 1 << 16, 4)
    sizes = t.hashsizes()
    assert len(sizes) == SUB
    assert all(s == t.nblocks * QUART for s in sizes)
    assert t.n_tables() == SUB


def test_n_occupied_counts_subtable0_lanes():
    """n_occupied is the nonzero-lane count of sub-table 0 — the same
    'occupancy of table 0' semantics the reference reports
    (storage.hh:176-198 tracks occupancy on table 0 only)."""
    t = BlockedCounttable(20, 1 << 14, 4)
    _fill(t, 500, seed=7)
    raw = np.asarray(t.tables[0])
    assert t.n_occupied() == int((raw[:, :QUART] != 0).sum())


def test_mix64_spreads_offsets():
    """All four lane offsets must be decorrelated from the block id
    (distinct hashes in one block get distinct lane patterns)."""
    rng = np.random.default_rng(1)
    h = rng.integers(0, 2**63, 4096, dtype=np.uint64)
    m = np.asarray(mix64(h))
    offs = np.stack([(m >> np.uint64(5 * t)) & np.uint64(QUART - 1)
                     for t in range(SUB)])
    for t in range(SUB):
        counts = np.bincount(offs[t].astype(int), minlength=QUART)
        # roughly uniform: no lane takes more than 3x its fair share
        assert counts.max() < 3 * len(h) / QUART


def test_saturation_at_255():
    t = BlockedCounttable(20, 1 << 12, 4)
    key = np.full(300, 12345, dtype=np.uint64)
    for _ in range(2):
        t._commit_hashes(key)
    assert int(t.get_counts_for_hashes(
        np.asarray([12345], np.uint64))[0]) == 255
