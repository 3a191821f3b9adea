#!/usr/bin/env python
"""Benchmark BASELINE config 2: normalize-by-median -C 20 over
data/stamps-reads.fa.gz (200k reads), via the device-scan engine.

Prints ONE JSON line. vs_baseline compares against the single-thread
C++ reference diginorm rate (~12k reads/s measured for khmer's
normalize-by-median on comparable CPUs; the reference publishes no
numbers in-repo, see BASELINE.md).
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

DATA = os.path.join(REPO, "data", "stamps-reads.fa.gz")
KHMER_CPU_BASELINE = 12000.0  # reads/s, single-thread C++ diginorm


def main():
    import jax

    from khmer_tpu import Countgraph
    from khmer_tpu.core.diginorm_scan import ScanNormalizer
    from khmer_tpu.io.fastx import FastxParser

    print("device: %s" % jax.devices()[0], file=sys.stderr)
    t0 = time.time()
    recs = list(FastxParser(DATA))
    print("parsed %d reads in %.2fs" % (len(recs), time.time() - t0),
          file=sys.stderr)

    cg = Countgraph(20, 1e6, 4)
    norm = ScanNormalizer(cg, 20, window=2048)
    bundles = [[r] for r in recs]

    # warmup / compile on the first window shape
    t0 = time.time()
    out = norm.process_window(bundles[:2048])
    kept = sum(len(x) for x in out)
    print("warmup (incl. compile): %.1fs" % (time.time() - t0),
          file=sys.stderr)

    t0 = time.time()
    for s in range(2048, len(bundles), 2048):
        out = norm.process_window(bundles[s:s + 2048])
        kept += sum(len(x) for x in out)
    norm.finalize()
    n_unique = cg.n_unique_kmers()  # hard sync
    dt = time.time() - t0
    n = len(bundles) - 2048
    rate = n / dt
    print("normalized %d reads in %.2fs; kept %d; %d unique k-mers"
          % (n, dt, kept, n_unique), file=sys.stderr)
    print(json.dumps({
        "metric": "normalize_by_median_reads_per_sec",
        "value": round(rate, 1),
        "unit": "reads/s",
        "vs_baseline": round(rate / KHMER_CPU_BASELINE, 3),
    }))


if __name__ == "__main__":
    main()
