"""Config-5-scale partition regression: the FULL stamps-reads workload
pinned against a golden produced by the unmodified reference liboxli
(tests/golden/stamps_ref_pmap.txt.gz, written by refdump built from
tests/golden/refbench.cc's library on 2026-08-20: Nodegraph(20,
primes near 12.5e6, 4), consume_seqfile_and_tag, do_partition(0, 0,
false, stop_big_traversals=true) -> 16121 tags, 51 partitions, 16025
unassigned).

Round 3's BENCH_CONFIGS carried a wrong hand-recorded value (127) for
this workload; this test pins the real reference behavior at full
scale so any future drift in tagging, BFS semantics, or union-find ID
assignment fails loudly.  Runs in ~2 s on the native host tier.
"""

import gzip
import os

import pytest

from khmer_tpu import Nodegraph
from khmer_tpu.core import hostengine
from khmer_tpu.core.partition import SubsetPartition

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STAMPS = os.path.join(REPO, "data", "stamps-reads.fa.gz")
GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "stamps_ref_pmap.txt.gz")


@pytest.mark.skipif(not hostengine.available(),
                    reason="needs the native host engine (the device "
                           "path takes minutes at this scale)")
def test_stamps_partition_matches_reference_pmap():
    ref = {}
    with gzip.open(GOLDEN, "rt") as f:
        for line in f:
            tag, pid = line.split()
            ref[int(tag)] = int(pid)

    ng = Nodegraph(20, 12.5e6, 4)
    reads, consumed = ng.consume_seqfile_and_tag(STAMPS)
    assert reads == 200000
    assert consumed == 536430          # new k-mers (reference value)
    assert sorted(ng.all_tags) == sorted(ref)   # tag set byte parity

    sp = SubsetPartition(ng)
    sp.do_partition(0, 0, stop_big_traversals=True)
    n_part, n_un = sp.count_partitions()
    assert (n_part, n_un) == (51, 16025)
    mismatches = [t for t in ref if sp.get_partition_id(t) != ref[t]]
    assert not mismatches, mismatches[:10]
