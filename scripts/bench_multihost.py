#!/usr/bin/env python
"""Multi-host scaling sweep — writes MULTIHOST_SCALING_r05.json.

Runs the full multihost validation pipeline (tests/multihost_worker.py:
per-host tagged builds, DCN bit-table union + tag allgather, tag-range
partitioning with pmap fold, global-mesh routed consume, HLL
max-merge) at N = 1, 2, 4 real jax.distributed processes over a FIXED
total workload (same files, same global mesh size), and records each
phase's wall clock from the worker's own timers.

What to read from it: local_build_s should shrink ~1/N (per-host file
decomposition); the DCN merge phases (dcn_union_s, hll_merge_s,
pmap_fold_s) are the N-scaling overhead — on localhost they measure
protocol+serialization cost, the lower bound of what a real DCN adds.

reference: oxli/partition.py:22-45 (tag-range decomposition),
src/oxli/subset.cc:884 (pmap merge protocol).
"""

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import random


def write_inputs(workdir, nfiles=4, reads_per_file=2500):
    rng = random.Random(1234)
    pool = ["".join(rng.choice("ACGT") for _ in range(150))
            for _ in range(600)]
    for i in range(nfiles):
        with open(os.path.join(workdir, "part%d.fa" % i), "w") as fp:
            for j in range(reads_per_file):
                fp.write(">p%d_r%d\n%s\n" % (i, j, rng.choice(pool)))


def main():
    from test_multihost import run_workers

    results = {"workload": "4 files x 2500 reads x 150bp, fixed; "
                           "8-device global mesh at every N",
               "runs": {}}
    base = tempfile.mkdtemp(prefix="mh_sweep_")
    try:
        write_inputs(base)
        for nprocs in (1, 2, 4):
            workdir = os.path.join(base, "n%d" % nprocs)
            os.makedirs(workdir)
            for f in os.listdir(base):
                if f.endswith(".fa"):
                    shutil.copy(os.path.join(base, f), workdir)
            # 4e6-bit tables: the sweep's ~82k distinct 15-mers at a
            # sane Bloom FP rate (the tests' tiny default saturates
            # here, and a saturated Bloom makes partition BFS explore
            # the whole 4^15 space)
            res = run_workers(workdir, nprocs=nprocs, timeout=900,
                              table_size=4e6)
            results["runs"][nprocs] = {
                "devices": res["devices"],
                "n_partitions": res["n_partitions"],
                "hll_estimate": res["hll_estimate"],
                "timings": res["timings"],
            }
            print("N=%d %s" % (nprocs, json.dumps(res["timings"])),
                  file=sys.stderr)
        # cross-N exactness: same inputs => identical results
        vals = list(results["runs"].values())
        assert all(v["n_partitions"] == vals[0]["n_partitions"]
                   for v in vals)
        assert all(v["hll_estimate"] == vals[0]["hll_estimate"]
                   for v in vals)
        results["exact_across_N"] = True
    finally:
        shutil.rmtree(base, ignore_errors=True)
    out = os.path.join(REPO, "MULTIHOST_SCALING_r05.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"wrote": out}))


if __name__ == "__main__":
    main()
