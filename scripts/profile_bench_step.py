#!/usr/bin/env python
"""Time the bench's exact fused step in isolation, then variants."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import jax.numpy as jnp
import numpy as np

from khmer_tpu.core import pipeline, sketch_kernels as K
from khmer_tpu.core.sketch import Countgraph
from khmer_tpu.io.fastx import FastxParser

DATA = os.path.join(REPO, "data", "25k.fq.gz")
KSIZE = 20


def main():
    packer = pipeline.FlatPacker(KSIZE)
    chunks = []
    for rec in FastxParser(DATA):
        if len(rec.cleaned_seq) >= KSIZE:
            chunks.extend(packer.add(rec.cleaned_seq))
    tail = packer.flush()
    if tail is not None:
        chunks.append(tail)

    graph = Countgraph(KSIZE, 5e7, 4)
    print("storage_kind=%s hash_family=%s primes=%s bigcount=%s"
          % (graph.storage_kind, graph.hash_family, graph._primes,
               graph._use_bigcount), file=sys.stderr)
    step = pipeline.make_flat_consume(graph.storage_kind, graph._primes,
                                      KSIZE, graph.hash_family)
    dev = jax.devices()[0]
    codes, starts, nfill = chunks[0]
    codes_d = jax.device_put(jnp.asarray(codes), dev)
    starts_d = jax.device_put(jnp.asarray(starts), dev)
    tables = jax.device_put(graph.tables, dev)
    nfill_d = jnp.int32(nfill)

    out = step(tables, jnp.uint64(0), jnp.zeros((), jnp.uint64),
               codes_d, starts_d, nfill_d)
    jax.block_until_ready(out)
    tables, n_unique, n_consumed, _ = out

    reps = 20
    t0 = time.time()
    for _ in range(reps):
        tables, n_unique, n_consumed, _ = step(
            tables, n_unique, n_consumed, codes_d, starts_d, nfill_d)
    jax.block_until_ready((tables, n_unique, n_consumed))
    dt = (time.time() - t0) / reps
    nk = int(n_consumed) // (reps + 1)
    print("bench-exact step: %.2f ms -> %.1f M k-mers/s (%d k-mers)"
          % (dt * 1e3, nk / dt / 1e6, nk))


if __name__ == "__main__":
    main()
