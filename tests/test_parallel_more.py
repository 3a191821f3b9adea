"""Distributed graph/streaming algorithms on the 8-device CPU mesh:
partitioning with mesh membership probes, sharded diginorm scan, mesh
HLL merge, and all_to_all-routed sharded counting."""

import numpy as np
import pytest

import jax

from khmer_tpu import Countgraph, Nodegraph, HLLCounter
from khmer_tpu.core.partition import SubsetPartition
from khmer_tpu.parallel import sharded
from khmer_tpu.parallel.graph import ShardedNodegraph
from khmer_tpu.parallel.diginorm import ShardedScanNormalizer
from khmer_tpu.parallel.hll import consume_seqfile_sharded
from khmer_tpu.core.diginorm_scan import ScanNormalizer

DATA = "/root/reference/tests/test-data/"


@pytest.fixture(scope="module")
def mesh():
    return sharded.make_mesh()


def _bundles(path, k=20):
    from khmer_tpu.core import pipeline
    from khmer_tpu.io.pairing import broken_paired_reader

    out = []
    for _n, _pair, r1, r2 in broken_paired_reader(
            pipeline.records_from(path)):
        out.append([r for r in (r1, r2) if r is not None])
    return out


# -- distributed partitioning --------------------------------------------

def test_sharded_partition_matches_local(mesh):
    def build():
        g = Nodegraph(20, 1e6, 4)
        g.consume_seqfile_and_tag(DATA + "random-20-a.fa")
        return g

    g1 = build()
    sp1 = SubsetPartition(g1)
    sp1.do_partition(0, 0)

    g2 = build()
    sp2 = SubsetPartition(ShardedNodegraph(g2, mesh))
    sp2.do_partition(0, 0)

    assert sp1.count_partitions() == sp2.count_partitions()
    m1 = {t: sp1.get_partition_id(t) for t in sorted(g1.all_tags)}
    m2 = {t: sp2.get_partition_id(t) for t in sorted(g2.all_tags)}
    assert m1 == m2 and len(m1) > 0


def test_sharded_partition_two_components(mesh):
    """Disjoint sequence sets must come out as separate partitions,
    identically local vs mesh."""
    def build():
        g = Nodegraph(20, 1e6, 4)
        g.consume_seqfile_and_tag(DATA + "random-20-a.fa")
        g.consume_seqfile_and_tag(DATA + "random-20-b.fa")
        return g

    g1 = build()
    sp1 = SubsetPartition(g1)
    sp1.do_partition(0, 0)
    n1 = sp1.count_partitions()

    g2 = build()
    sp2 = SubsetPartition(ShardedNodegraph(g2, mesh))
    sp2.do_partition(0, 0)
    assert sp2.count_partitions() == n1
    m1 = {t: sp1.get_partition_id(t) for t in sorted(g1.all_tags)}
    m2 = {t: sp2.get_partition_id(t) for t in sorted(g2.all_tags)}
    assert m1 == m2


def test_sharded_pmap_save_matches_local(mesh, tmp_path):
    g1 = Nodegraph(20, 1e6, 4)
    g1.consume_seqfile_and_tag(DATA + "random-20-a.fa")
    sp1 = SubsetPartition(g1)
    sp1.do_partition(0, 0)
    p1 = str(tmp_path / "local.pmap")
    sp1.save_partitionmap(p1)

    g2 = Nodegraph(20, 1e6, 4)
    g2.consume_seqfile_and_tag(DATA + "random-20-a.fa")
    sp2 = SubsetPartition(ShardedNodegraph(g2, mesh))
    sp2.do_partition(0, 0)
    p2 = str(tmp_path / "mesh.pmap")
    sp2.save_partitionmap(p2)

    with open(p1, "rb") as a, open(p2, "rb") as b:
        assert a.read() == b.read()


def test_sharded_membership_matches_local(mesh):
    g = Nodegraph(20, 1e5, 4)
    g.consume_seqfile_and_tag(DATA + "random-20-a.fa")
    sg = ShardedNodegraph(g, mesh)
    rng = np.random.default_rng(0)
    f = rng.integers(0, 2**40, 512, dtype=np.uint64)
    lo = g.neighbors_batch(f, f)
    sh = sg.neighbors_batch(f, f)
    np.testing.assert_array_equal(np.asarray(lo[3]), np.asarray(sh[3]))
    np.testing.assert_array_equal(np.asarray(lo[2]), np.asarray(sh[2]))


# -- sharded diginorm ------------------------------------------------------

def test_sharded_diginorm_matches_single_device(mesh):
    path = DATA + "100-reads.fq.gz"

    g1 = Countgraph(17, 1e5, 4)
    n1 = ScanNormalizer(g1, 10, window=64)
    kept1 = []
    bundles = _bundles(path, 17)
    for s in range(0, len(bundles), 64):
        for rec_list in n1.process_window(bundles[s:s + 64]):
            kept1.extend(r.name for r in rec_list)
    n1.finalize()

    g2 = Countgraph(17, 1e5, 4)
    n2 = ShardedScanNormalizer(g2, 10, mesh, window=64)
    kept2 = []
    for s in range(0, len(bundles), 64):
        for rec_list in n2.process_window(bundles[s:s + 64]):
            kept2.extend(r.name for r in rec_list)
    n2.finalize()

    assert kept1 == kept2 and len(kept1) > 0
    assert g1.n_unique_kmers() == g2.n_unique_kmers()
    for t1, t2 in zip(g1.tables, g2.tables):
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


# -- mesh HLL --------------------------------------------------------------

def test_sharded_hll_matches_single_device(mesh):
    path = DATA + "random-20-a.fa"
    a = HLLCounter(0.01, 20)
    a.consume_seqfile(path)
    b = HLLCounter(0.01, 20)
    reads_b, cons_b = consume_seqfile_sharded(b, path, mesh)
    assert a.estimate_cardinality() == b.estimate_cardinality()
    np.testing.assert_array_equal(np.asarray(a.counters_dev),
                                  np.asarray(b.counters_dev))
    assert reads_b > 0 and cons_b > 0


# -- routed sharded counting ----------------------------------------------

def test_routed_consume_matches_unrouted(mesh):
    from khmer_tpu.core.pipeline import FlatPacker
    from khmer_tpu.core import pipeline as pl

    k = 20
    chunk = 1 << 14

    def run(route):
        g = sharded.ShardedBlockedCountgraph(k, 65536, 4, mesh,
                                             route=route)
        packer = FlatPacker(k, chunk=chunk)
        chunks = []
        for rec in pl.records_from(DATA + "100-reads.fq.gz"):
            if len(rec.cleaned_seq) >= k:
                chunks.extend(packer.add(rec.cleaned_seq))
        tail = packer.flush()
        if tail is not None:
            # route step is compiled per chunk length; keep one shape
            codes = np.zeros(chunk, np.uint8)
            codes[: len(tail[0])] = tail[0][: chunk]
            chunks.append((codes, tail[1], tail[2]))
        total = 0
        for codes, starts, nfill in chunks:
            total += g.consume_chunk(codes, starts, nfill)
        return g, total

    g_r, tot_r = run(True)
    g_u, tot_u = run(False)
    assert tot_r == tot_u > 0
    assert g_r.n_unique_kmers() == g_u.n_unique_kmers()
    np.testing.assert_array_equal(np.asarray(g_r.tables[0]),
                                  np.asarray(g_u.tables[0]))
    # and against the single-device blocked graph
    local = g_r.to_local()
    from khmer_tpu.core.blocked import BlockedCountgraph

    ref = BlockedCountgraph(k, 65536, 4)
    ref.consume_seqfile(DATA + "100-reads.fq.gz")
    assert local.n_unique_kmers() == ref.n_unique_kmers()


def test_routed_overflow_detected(mesh):
    """A degenerate chunk (one k-mer repeated) trips the route
    capacity; the chunk replays on the gathered path (warning, route
    demoted) and the result is exact: one unique poly-A k-mer."""
    k = 20
    chunk = 1 << 13
    g = sharded.ShardedBlockedCountgraph(k, 65536, 4, mesh, route=True,
                                         route_slack=1.1)
    codes = np.zeros(chunk, np.uint8)          # poly-A: one k-mer
    starts = np.full(chunk // 8, chunk, np.int32)
    starts[0] = 0
    with pytest.warns(RuntimeWarning, match="route capacity"):
        g.consume_chunk(codes, starts, chunk)
    assert g.route is False
    assert g.n_unique_kmers() == 1


def test_routed_scaling_work_shrinks(mesh):
    """The routed path's per-device update size is local_W*slack vs the
    all_gather path's full W — assert the compiled shapes reflect it."""
    from khmer_tpu.parallel.sharded import (
        make_sharded_blocked_consume_routed)

    D = mesh.devices.size
    chunk = 1 << 15
    k = 20
    fn = make_sharded_blocked_consume_routed(
        65521 // 128 * 128 + 1, 65536 // 128 // D, k, chunk, mesh, 2.0)
    # capacity per (src,dst) = ceil(local/D * slack); routed stream per
    # device = D * C ~= 2/D of the full W windows
    local = chunk // D
    C = -(-int(local * 2.0) // D)
    assert D * C < chunk // 2


def test_routed_membership_matches_broadcast(mesh):
    """The fused single-collective routed probe (opt-in for real-ICI
    pods; ShardedNodegraph defaults to broadcast) must agree with the
    broadcast path on mixed and duplicate-heavy candidate sets — the
    rewritten [dst][table][rank] slot layout has no other guard."""
    from khmer_tpu import Nodegraph
    from khmer_tpu.parallel import graph as PG

    rng = np.random.default_rng(23)
    g = Nodegraph(20, 1e6, 4)
    member_hashes = []
    for _ in range(120):
        seq = "".join("ATCG"[b] for b in rng.integers(0, 4, 90))
        g.consume(seq)
        member_hashes.append(g._hashes_for_sequence(seq))
    members = np.unique(np.concatenate(member_hashes))

    sg_b = PG.ShardedNodegraph(g, mesh, route=False)
    sg_r = PG.ShardedNodegraph(g, mesh, route=True)

    # mixed: real members + random foreigners, shuffled
    foreign = rng.integers(0, 1 << 40, 4096, dtype=np.uint64)
    cand = np.concatenate([members[:2048], foreign])
    rng.shuffle(cand)
    np.testing.assert_array_equal(sg_r.get_counts_for_hashes(cand),
                                  sg_b.get_counts_for_hashes(cand))

    # duplicate-heavy: one hash repeated hard (stresses rank/capacity;
    # overflow falls back to broadcast inside get_counts_for_hashes)
    dup = np.concatenate([np.full(2048, members[0], np.uint64),
                          foreign[:2048]])
    np.testing.assert_array_equal(sg_r.get_counts_for_hashes(dup),
                                  sg_b.get_counts_for_hashes(dup))
