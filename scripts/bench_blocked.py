#!/usr/bin/env python
"""Benchmark the blocked (TPU-native) counting path on the same
workload as bench.py, at equal memory (4 x 5e7 bytes)."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import json

import jax
import jax.numpy as jnp

from khmer_tpu.core import pipeline
from khmer_tpu.core.blocked import BlockedCountgraph
from khmer_tpu.io.fastx import FastxParser

DATA = os.path.join(REPO, "data", "25k.fq.gz")
K = 20


def main():
    dev = jax.devices()[0]
    print("device: %s" % dev, file=sys.stderr)
    packer = pipeline.FlatPacker(K)
    chunks = []
    for rec in FastxParser(DATA):
        if len(rec.cleaned_seq) >= K:
            chunks.extend(packer.add(rec.cleaned_seq))
    tail = packer.flush()
    if tail is not None:
        chunks.append(tail)

    graph = BlockedCountgraph(K, 5e7, 4)
    step = pipeline.make_flat_consume(graph.storage_kind, graph._primes,
                                      K, graph.hash_family)
    dev_chunks = [(jax.device_put(jnp.asarray(c), dev),
                   jax.device_put(jnp.asarray(s), dev), jnp.int32(n))
                  for c, s, n in chunks]
    tables = jax.device_put(graph.tables, dev)

    def run_all(tables, n_unique, n_consumed, overflow):
        for codes, starts, nfill in dev_chunks:
            tables, n_unique, n_consumed, overflow, _ = step(
                tables, n_unique, n_consumed, overflow, codes, starts,
                nfill)
        return tables, n_unique, n_consumed, overflow

    t0 = time.time()
    state = run_all(tables, jnp.uint64(0), jnp.zeros((), jnp.uint64),
                    jnp.zeros((), bool))
    state = run_all(*state)
    tables, n_unique, n_consumed, overflow = state
    total_kmers = int(n_consumed) // 2
    print("warmup (incl. compile): %.1fs; %d k-mers; %d unique"
          % (time.time() - t0, total_kmers, int(n_unique)),
          file=sys.stderr)

    reps = 50
    t0 = time.time()
    for _ in range(reps):
        tables, n_unique, n_consumed, overflow = run_all(
            tables, n_unique, n_consumed, overflow)
    _ = int(n_consumed)  # hard sync through the tunnel
    dt = time.time() - t0
    rate = total_kmers * reps / dt
    print("blocked counting rate: %.3g k-mers/s" % rate, file=sys.stderr)
    print(json.dumps({
        "metric": "blocked_countgraph_kmers_per_sec",
        "value": round(rate, 1),
        "unit": "k-mers/s",
        "vs_baseline": round(rate / 3.0e6, 3),
    }))


if __name__ == "__main__":
    main()
