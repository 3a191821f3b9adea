#!/usr/bin/env python
"""Micro-profile of flat-consume pieces with HARD host-sync timing.

block_until_ready does not reliably sync through the axon tunnel, so
every timed piece returns a tiny scalar that is fetched to host.
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

from khmer_tpu.core import pipeline, sketch_kernels as K
from khmer_tpu.ops import hashing as H

KSIZE = 20
CHUNK = pipeline.FLAT_CHUNK
PRIMES = tuple(K.get_n_primes_near_x(4, int(5e7)))
W = CHUNK - KSIZE + 1


def timeit(fn, *args, reps=3, name=""):
    s = fn(*args)
    _ = float(np.asarray(s))  # hard sync incl. compile
    t0 = time.time()
    for _i in range(reps):
        s = fn(*args)
    _ = float(np.asarray(s))
    dt = (time.time() - t0) / reps
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, CHUNK, dtype=np.uint8))
    hashes0 = rng.integers(0, 2**63, W, dtype=np.uint64)
    hashes = jnp.asarray(hashes0)
    valid = jnp.asarray(np.ones(W, dtype=bool))
    _ = float(np.asarray(jnp.sum(codes.astype(jnp.int32))))  # device warm

    if which in ("all", "hash"):
        timeit(jax.jit(lambda c: H.hash_windows(c, KSIZE, "murmur")[0]
                       .astype(jnp.uint32)),
               codes, name="murmur hash_windows")
        timeit(jax.jit(lambda c: H.rolling_hash_windows(c, KSIZE)[0][0]
                       .astype(jnp.uint32)),
               codes, name="twobit rolling hash")

    if which in ("all", "prim"):
        timeit(jax.jit(lambda h: (h % np.uint64(PRIMES[0]))[0]
                       .astype(jnp.uint32)),
               hashes, name="u64 mod x1")
        timeit(jax.jit(lambda h: jnp.sort(h)[0].astype(jnp.uint32)),
               hashes, name="sort u64 W")

        tables = K.init_tables("byte", PRIMES)
        timeit(jax.jit(lambda t, h: jnp.take(
            t, (h % np.uint64(PRIMES[0]))).astype(jnp.int32)[0]),
            tables[0], hashes, name="gather 1 table")

        def bare_scatter(h):
            bins = h % np.uint64(PRIMES[0])
            img = jnp.zeros(PRIMES[0], jnp.int32).at[bins].add(1)
            return img[0]
        timeit(jax.jit(bare_scatter), hashes, name="scatter-add 1 image")

        def bare_scatter_min(h):
            bins = h % np.uint64(PRIMES[0])
            eidx = jnp.arange(W, dtype=jnp.int32)
            img = jnp.full(PRIMES[0], np.int32(2**31 - 1),
                           jnp.int32).at[bins].min(eidx)
            return img[0]
        timeit(jax.jit(bare_scatter_min), hashes,
               name="scatter-min 1 image")

        def zeros_only():
            return jnp.zeros(PRIMES[0], jnp.int32)[0]
        timeit(jax.jit(zeros_only), name="zeros(P) i32 alone")

        def scatter_u32idx(h32):
            img = jnp.zeros(PRIMES[0], jnp.int32).at[h32].add(
                1, mode="drop")
            return img[0]
        bins32 = jnp.asarray((hashes0 % np.uint64(PRIMES[0])
                              ).astype(np.int32))
        timeit(jax.jit(scatter_u32idx), bins32,
               name="scatter-add 1 image (i32 idx precomp)")

    if which in ("all", "img"):
        tables = K.init_tables("byte", PRIMES)

        def img_update(tables, h, v):
            tables, n_unique, out = K.image_update_outputs(
                PRIMES, tables, jnp.uint64(0), h, v, False, False)
            return n_unique.astype(jnp.uint32) + tables[0][0]
        timeit(jax.jit(img_update), tables, hashes, valid,
               name="image update (4 tables)")


if __name__ == "__main__":
    main()
