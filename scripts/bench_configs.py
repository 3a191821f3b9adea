#!/usr/bin/env python
"""BASELINE configs 2-5 benchmark — writes BENCH_CONFIGS.json.

Reference baselines were measured on THIS machine by compiling the
unmodified liboxli (src/oxli + third-party, g++ -O3 -fopenmp) and
timing the same hot loops (driver: tests/golden/refbench.cc):

  config 2  diginorm C=20, stamps-reads.fa.gz : 200000 reads / 2.175 s
            = 91,954 reads/s (kept 10,141)
  config 4  HLL 0.01 k=20, stamps-genomes.fa  : 7,962 reads / 0.010 s
            (estimate 7,948)
  config 5  tag+partition, stamps-reads.fa.gz : tag 4.358 s
            (798,736 k-mers -> 183k k-mers/s) + partition 3.423 s
  config 1  (bench.py) count 25k.fq.gz        : 1,248,896 k-mers /
            0.510 s = 2.449M k-mers/s single thread; threads SLOW the
            reference down on this host (2T 0.706 s, 4T 0.876 s,
            8T 1.033 s — atomics contention), so 1T is the best
            reference operating point here.

Config 3 (trim-low-abund two-pass) runs on data/25k.fq.gz (BASELINE
names 100k-filtered.fa, which the reference checkout does not ship;
100k-surrendered.fa has only 21 records); the reference rate for its
pass-1 hot loop is approximated by the diginorm rate (same
get_median_count + consume structure).
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

STAMPS_READS = os.path.join(REPO, "data", "stamps-reads.fa.gz")
STAMPS_GENOMES = os.path.join(REPO, "data", "stamps-genomes.fa")
# BASELINE config 3 names 100k-filtered.fa, which is not shipped in
# the reference checkout (100k-surrendered.fa has only 21 records);
# the 25k read set is the largest in-repo FASTQ with real coverage.
HUNDREDK = os.path.join(REPO, "data", "25k.fq.gz")

REF = {
    "normalize_reads_per_sec": 91954.0,
    "hll_seconds": 0.010,
    "partition_tag_seconds": 4.358,
    "partition_bfs_seconds": 3.423,
    "trim_reads_per_sec": 91954.0,   # proxy: same hot-loop structure
}


def bench_normalize():
    from khmer_tpu import Countgraph
    from khmer_tpu.core import pipeline
    from khmer_tpu.core.diginorm_scan import ScanNormalizer
    from khmer_tpu.io.pairing import broken_paired_reader

    W = 16384
    g = Countgraph(20, 1e8 // 4, 4)
    norm = ScanNormalizer(g, 20, window=W)
    # collect bundles up-front (host parse is not the measured loop)
    # and compile the window shape before starting the clock, like
    # refbench.cc times only the hot loop
    bundles = []
    for _n, _p, r1, r2 in broken_paired_reader(
            pipeline.records_from(STAMPS_READS)):
        bundles.append([r for r in (r1, r2) if r is not None])
    total = sum(len(b) for b in bundles)
    kept = 0
    for res in norm.process_window(bundles[:W]):
        kept += len(res)
    t0 = time.time()
    for s in range(W, len(bundles), W):
        for res in norm.process_window(bundles[s:s + W]):
            kept += len(res)
    norm.finalize()
    int(g.n_unique_kmers())  # device sync
    dt = time.time() - t0
    total -= sum(len(b) for b in bundles[:W])
    rate = total / dt
    return {
        "config": 2,
        "metric": "normalize_by_median_reads_per_sec",
        "value": round(rate, 1),
        "seconds": round(dt, 3),
        "reads": total,
        "kept": kept,
        "vs_baseline": round(rate / REF["normalize_reads_per_sec"], 3),
    }


def bench_trim():
    import tempfile

    from khmer_tpu.cli import trim_low_abund

    def run(outpath):
        argv = sys.argv
        sys.argv = ["trim-low-abund.py", "-k", "20", "-M", "100M",
                    "-o", outpath, HUNDREDK]
        try:
            trim_low_abund.main()
            return True, ""
        except SystemExit as e:
            return (not e.code), str(e)
        finally:
            sys.argv = argv

    with tempfile.TemporaryDirectory() as td:
        run(os.path.join(td, "warm.abundtrim"))   # compile pass
        t0 = time.time()
        ok, err = run(os.path.join(td, "out.abundtrim"))
        dt = time.time() - t0
    # count reads in the input once for the rate
    from khmer_tpu.core import pipeline

    nreads = sum(1 for _ in pipeline.records_from(HUNDREDK))
    rate = nreads / dt
    return {
        "config": 3,
        "metric": "trim_low_abund_reads_per_sec",
        "value": round(rate, 1),
        "seconds": round(dt, 3),
        "reads": nreads,
        "ok": ok,
        "stderr_tail": err if not ok else "",
        "vs_baseline": round(rate / REF["trim_reads_per_sec"], 3),
    }


def bench_hll():
    from khmer_tpu import HLLCounter, Nodegraph

    # warm pass compiles the HLL scatter-max and the tagged flat
    # consume (the axon backend does not serve these executables from
    # the persistent compile cache); the timed pass is steady-state,
    # matching refbench.cc which times only the hot loop
    HLLCounter(0.01, 20).consume_seqfile(STAMPS_GENOMES)
    Nodegraph(20, 2.5e7, 4).consume_seqfile_and_tag(STAMPS_GENOMES)

    h = HLLCounter(0.01, 20)
    t0 = time.time()
    reads, cons = h.consume_seqfile(STAMPS_GENOMES)
    est = h.estimate_cardinality()
    dt_h = time.time() - t0
    t0 = time.time()
    ng = Nodegraph(20, 2.5e7, 4)
    ng.consume_seqfile_and_tag(STAMPS_GENOMES)
    dt_g = time.time() - t0
    return {
        "config": 4,
        "metric": "unique_kmers_plus_load_graph_seconds",
        "value": round(dt_h + dt_g, 3),
        "hll_seconds": round(dt_h, 3),
        "loadgraph_seconds": round(dt_g, 3),
        "estimate": est,
        "reference_estimate": 7948,
        "vs_baseline": round(REF["hll_seconds"] / max(dt_h, 1e-9), 3),
    }


def bench_partition():
    from khmer_tpu import Nodegraph
    from khmer_tpu.core.partition import SubsetPartition

    # warm the tagged-consume + probe shapes on the small genome file
    # (same jit shapes; axon serves no persistent cache for them)
    Nodegraph(20, 12.5e6, 4).consume_seqfile_and_tag(STAMPS_GENOMES)

    ng = Nodegraph(20, 12.5e6, 4)
    t0 = time.time()
    ng.consume_seqfile_and_tag(STAMPS_READS)
    dt_tag = time.time() - t0
    sp = SubsetPartition(ng)
    t0 = time.time()
    sp.do_partition(0, 0, stop_big_traversals=True)
    dt_bfs = time.time() - t0
    n_part, n_un = sp.count_partitions()
    return {
        "config": 5,
        "metric": "do_partition_seconds",
        "value": round(dt_tag + dt_bfs, 3),
        "tag_seconds": round(dt_tag, 3),
        "bfs_seconds": round(dt_bfs, 3),
        "n_partitions": n_part,
        "reference_n_partitions": 127,
        "vs_baseline": round(
            (REF["partition_tag_seconds"] + REF["partition_bfs_seconds"])
            / max(dt_tag + dt_bfs, 1e-9), 3),
    }


def main():
    import jax

    results = {"device": str(jax.devices()[0])}
    for name, fn in (("normalize", bench_normalize),
                     ("trim", bench_trim),
                     ("hll_loadgraph", bench_hll),
                     ("partition", bench_partition)):
        t0 = time.time()
        try:
            results[name] = fn()
        except Exception as e:  # record, keep going
            results[name] = {"error": "%s: %s" % (type(e).__name__, e)}
        print("%-14s %.1fs %s" % (name, time.time() - t0,
                                  json.dumps(results[name])[:200]),
              file=sys.stderr)
    out = os.path.join(REPO, "BENCH_CONFIGS.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"wrote": out}))


if __name__ == "__main__":
    main()
