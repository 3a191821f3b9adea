"""One process of the N-process multihost validation run.

Launched by tests/test_multihost.py (and scripts/bench_multihost.py)
as:

    python tests/multihost_worker.py <coordinator> <nprocs> <pid> \
        <out.json> <workdir> [local_devices]

Boots jax.distributed on the CPU backend (local_devices virtual
devices per process -> one global mesh across all processes), then
runs:

1. per-host file assignment + host-tier tagged Nodegraph builds,
   merged across hosts with union_bit_tables (+ tag-set union) — the
   reference's update_from/pmap-merge model over DCN;
2. per-host subset partitioning of a tag range, merged via the pmap
   protocol on process 0;
3. a GLOBAL-mesh sharded consume (all_to_all routed) where each host
   contributes its slice of one read chunk;
4. per-host HLL registers, max-merged.

Process 0 writes counts/estimates to <out.json>; the test compares
them against a single-process oracle run.
"""

import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("KHMER_TPU_ENGINE", "auto")

import numpy as np


def main():
    coordinator, nprocs, pid, outpath, workdir = sys.argv[1:6]
    nprocs, pid = int(nprocs), int(pid)
    local_devices = int(sys.argv[6]) if len(sys.argv) > 6 else 4
    table_size = float(sys.argv[7]) if len(sys.argv) > 7 else 20000

    import time

    from khmer_tpu.parallel import multihost

    jax = multihost.initialize(coordinator, nprocs, pid,
                               local_device_count=local_devices)
    assert jax.process_count() == nprocs
    mesh = multihost.global_mesh()
    assert mesh.devices.size == local_devices * nprocs
    timings = {}

    def log(msg):
        print("[worker %d/%d] %s" % (pid, nprocs, msg), file=sys.stderr,
              flush=True)
    log("mesh up: %d devices" % mesh.devices.size)

    from khmer_tpu import HLLCounter, Nodegraph
    from khmer_tpu.core import pipeline
    from khmer_tpu.core.partition import SubsetPartition
    from khmer_tpu.parallel import sharded

    import glob

    files = sorted(glob.glob(os.path.join(workdir, "part*.fa")))
    mine = multihost.files_for_process(files)

    # -- 1: per-host tagged builds, DCN union ---------------------------
    g = Nodegraph(15, table_size, 4)
    t0 = time.time()
    for f in mine:
        g.consume_seqfile_and_tag(f)
    timings["local_build_s"] = time.time() - t0
    log("built: %d tags" % len(g.all_tags))
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("built")
    t0 = time.time()
    merged_tables = multihost.union_bit_tables(mesh, g.host_view())
    tag_arrays = multihost_utils.process_allgather(
        _padded_tags(g.all_tags))
    timings["dcn_union_s"] = time.time() - t0
    log("dcn union done")
    all_tags = set()
    for row in np.asarray(tag_arrays):
        all_tags.update(int(t) for t in row if t != 0xFFFFFFFFFFFFFFFF)

    merged = Nodegraph(15, 1, 0, primes=g._primes)
    mt = merged.host_tables()
    for a, b in zip(mt, merged_tables):
        a[:] = b
    merged.all_tags = set(all_tags)

    # -- 2: split the tag range across hosts, partition, pmap-merge -----
    # (the reference's oxli/partition.py:22-45 decomposition: one tag
    # range per worker, pmap files folded on one host)
    tags_sorted = sorted(all_tags)
    n_tags_total = len(tags_sorted)
    lo = pid * n_tags_total // nprocs
    hi = (pid + 1) * n_tags_total // nprocs
    sp = SubsetPartition(merged)
    span = tags_sorted[lo:hi]
    t0 = time.time()
    from khmer_tpu.core import hostengine

    if span:
        if hostengine.use_host_for(merged, "graph"):
            tagged = hostengine.find_all_tags_range(
                merged, span, False, False)
        else:
            from khmer_tpu.core.partition import find_all_tags_batch
            from khmer_tpu.ops import hashing as H

            starts = []
            for t in span:
                s = H.reverse_hash(t, 15)
                _, f, r = H._hash_scalar(s, 15)
                starts.append((f, r))
            tagged = find_all_tags_batch(merged, starts)
        for t, tk in zip(span, tagged):
            sp.assign_partition_id(t, tk)
    timings["partition_bfs_s"] = time.time() - t0
    log("partition bfs done")
    pmap_path = os.path.join(workdir, "subset.%d.pmap" % pid)
    sp.save_partitionmap(pmap_path)
    multihost_utils.sync_global_devices("pmaps_saved")

    n_partitions = n_unassigned = None
    if pid == 0:
        t0 = time.time()
        final = SubsetPartition(merged)
        for i in range(nprocs):
            final.merge_from_disk(
                os.path.join(workdir, "subset.%d.pmap" % i))
        n_partitions, n_unassigned = final.count_partitions()
        timings["pmap_fold_s"] = time.time() - t0

    # -- 3: global-mesh sharded consume (each host ships its slice) -----
    chunk = 1 << 12
    local = chunk // nprocs
    packer = pipeline.FlatPacker(15, chunk=local)
    local_chunks = []
    for f in mine:
        for rec in pipeline.records_from(f):
            local_chunks.extend(packer.add(rec.cleaned_seq))
    tail = packer.flush()
    if tail is not None:
        local_chunks.append(tail)
    # one step is enough for the dryrun: first local chunk per host
    codes_l, starts_l, nfill_l = local_chunks[0]
    starts_global = np.asarray(starts_l, np.int64) + pid * local
    starts_global = starts_global[np.asarray(starts_l) < nfill_l]
    allstarts = multihost_utils.process_allgather(
        _pad_i64(starts_global, local))
    allstarts = np.sort(np.asarray(allstarts).ravel())
    allstarts = allstarts[allstarts < chunk].astype(np.int32)
    spad = np.full(1 << 11, chunk, np.int32)
    spad[: len(allstarts)] = allstarts

    sg = sharded.ShardedCountgraph(15, table_size, 4, mesh,
                                   route=True, route_slack=4.0)
    t0 = time.time()
    multihost.global_consume(sg, codes_l, spad, chunk)
    global_unique = sg.n_unique_kmers()
    timings["global_consume_compile_s"] = time.time() - t0
    # warm re-run on a fresh graph: the steady-state step time (the
    # first consume above is dominated by per-process jit compile)
    sg2 = sharded.ShardedCountgraph(15, table_size, 4, mesh,
                                    route=True, route_slack=4.0)
    t0 = time.time()
    multihost.global_consume(sg2, codes_l, spad, chunk)
    assert sg2.n_unique_kmers() == global_unique
    timings["global_consume_s"] = time.time() - t0
    log("global consume done")

    # -- 4: HLL max-merge ------------------------------------------------
    h = HLLCounter(0.01, 15)
    for f in mine:
        h.consume_seqfile(f)
    t0 = time.time()
    regs = multihost.max_registers(mesh, h._registers_view())
    timings["hll_merge_s"] = time.time() - t0
    log("hll merge done")
    h2 = HLLCounter(0.01, 15)
    h2._adopt_registers(regs)
    estimate = h2.estimate_cardinality()

    if pid == 0:
        with open(outpath, "w") as f:
            json.dump({
                "n_tags": len(all_tags),
                "merged_unique_bits": [int(np.unpackbits(t).sum())
                                       for t in merged_tables],
                "n_partitions": n_partitions,
                "n_unassigned": n_unassigned,
                "global_consume_unique": global_unique,
                "hll_estimate": estimate,
                "devices": mesh.devices.size,
                "processes": nprocs,
                "timings": {k: round(v, 4)
                            for k, v in timings.items()},
            }, f)
    multihost_utils.sync_global_devices("done")


def _padded_tags(tags, cap=4096):
    out = np.full(cap, 0xFFFFFFFFFFFFFFFF, dtype=np.uint64)
    ts = np.fromiter(tags, np.uint64, len(tags))
    out[: len(ts)] = ts
    return out


def _pad_i64(a, cap):
    out = np.full(cap, 1 << 40, dtype=np.int64)
    out[: len(a)] = a
    return out


if __name__ == "__main__":
    main()
