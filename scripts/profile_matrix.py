#!/usr/bin/env python
"""Isolate the slow dimension: hash family x data source."""
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
from khmer_tpu.io.fastx import FastxParser

DATA = os.path.join(REPO, "data", "25k.fq.gz")
KSIZE = 20
PRIMES = tuple(K.get_n_primes_near_x(4, int(5e7)))
CHUNK = pipeline.FLAT_CHUNK


def bench_step(step, codes_d, starts_d, nfill_d, name, reps=5):
    tables = K.init_tables("byte", PRIMES)
    out = step(tables, jnp.uint64(0), jnp.zeros((), jnp.uint64),
               codes_d, starts_d, nfill_d)
    tables, n_unique, n_consumed, _ = out
    _ = int(n_consumed)  # host round-trip: hard sync
    t0 = time.time()
    for _i in range(reps):
        tables, n_unique, n_consumed, _ = step(
            tables, n_unique, n_consumed, codes_d, starts_d, nfill_d)
    _ = int(n_consumed)  # hard sync
    dt = (time.time() - t0) / reps
    print(f"{name:44s} {dt*1e3:9.2f} ms")


def main():
    packer = pipeline.FlatPacker(KSIZE)
    chunks = []
    for rec in FastxParser(DATA):
        if len(rec.cleaned_seq) >= KSIZE:
            chunks.extend(packer.add(rec.cleaned_seq))
    tail = packer.flush()
    if tail is not None:
        chunks.append(tail)
    dev = jax.devices()[0]
    codes, starts, nfill = chunks[0]
    real_codes = jax.device_put(jnp.asarray(codes), dev)
    real_starts = jax.device_put(jnp.asarray(starts), dev)
    real_nfill = jnp.int32(nfill)

    rng = np.random.default_rng(0)
    syn_codes = jax.device_put(
        jnp.asarray(rng.integers(0, 4, CHUNK, dtype=np.uint8)), dev)
    syn_starts_np = np.full(pipeline.FLAT_MAX_READS, CHUNK, dtype=np.int32)
    syn_starts_np[:100] = np.arange(100) * 150
    syn_starts = jax.device_put(jnp.asarray(syn_starts_np), dev)
    syn_nfill = jnp.int32(CHUNK)

    for fam in ("murmur", "twobit"):
        step = pipeline.make_flat_consume("byte", PRIMES, KSIZE, fam)
        bench_step(step, syn_codes, syn_starts, syn_nfill,
                   f"{fam} synthetic")
        bench_step(step, real_codes, real_starts, real_nfill,
                   f"{fam} real")


if __name__ == "__main__":
    main()
