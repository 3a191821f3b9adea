#!/usr/bin/env python
"""Where do the non-kernel ns/event go in the flat consume step?

Times, each as its own jit at the bench's tail-chunk size:
  (a) rolling hash windows, (b) rid/valid mask computation,
  (c) blocked update alone, (d) the full fused flat step.
"""
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

from khmer_tpu.core import blocked as B
from khmer_tpu.core import pipeline
from khmer_tpu.core import sketch_kernels as K
from khmer_tpu.ops import hashing as H

CHUNK = 5 << 18          # the bench tail size
KSIZE = 20
NBLOCKS = int(K.get_n_primes_near_x(1, int(5e7) * 4 // 128 + 1)[0])


def timeit(name, fn, *args, reps=10):
    t0 = time.time()
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf.ravel()[:1])[0]
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf.ravel()[:1])[0]
    dt = (time.time() - t0) / reps
    W = CHUNK - KSIZE + 1
    print("%-30s %8.2f ms  %6.1f ns/event  (compile %.1fs)"
          % (name, dt * 1e3, dt / W * 1e9, compile_s), file=sys.stderr)
    return dt


def main():
    print("device: %s  chunk=%d nblocks=%d"
          % (jax.devices()[0], CHUNK, NBLOCKS), file=sys.stderr)
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, CHUNK, dtype=np.uint8))
    starts_np = np.full(pipeline.FLAT_MAX_READS, 1 << 21, np.int32)
    starts_np[:CHUNK // 150] = np.arange(0, CHUNK - 150, 150,
                                         np.int32)[:CHUNK // 150]
    starts = jnp.asarray(starts_np)
    nfill = jnp.int32(CHUNK)
    W = CHUNK - KSIZE + 1
    hashes = jnp.asarray(rng.integers(0, 2**63, W, dtype=np.uint64))
    valid = jnp.ones(W, bool)
    table = jnp.zeros((NBLOCKS, B.LANES), jnp.uint8)

    @jax.jit
    def just_hash(codes):
        return H.hash_windows(codes, KSIZE, "twobit")

    @jax.jit
    def just_mask(starts, nfill):
        rid = jnp.zeros(CHUNK, jnp.int32).at[starts].add(1, mode="drop")
        rid = jnp.cumsum(rid)
        return (rid[:W] == rid[KSIZE - 1:]) & \
            (jnp.arange(W, dtype=jnp.int32) + (KSIZE - 1) < nfill)

    upd = B.make_blocked_update(NBLOCKS)
    step = pipeline.make_flat_consume("blocked", (NBLOCKS,), KSIZE,
                                      "twobit", chunk=CHUNK)

    timeit("hash_windows (twobit)", just_hash, codes)
    timeit("rid/valid mask", just_mask, starts, nfill)
    timeit("blocked update alone", upd, (table,),
           jnp.zeros((), jnp.uint64), hashes, valid)
    table2 = jnp.zeros((NBLOCKS, B.LANES), jnp.uint8)
    timeit("full flat step", step, (table2,), jnp.uint64(0),
           jnp.zeros((), jnp.uint64), jnp.zeros((), bool), codes,
           starts, nfill)


if __name__ == "__main__":
    main()
