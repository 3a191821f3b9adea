#!/usr/bin/env python
"""Stage-level timing of the blocked counting path on the live device.

Times (a) window hashing, (b) the sort/dedup run-stats, (c) the one-hot
row scatter, (d) the packed image pass + row gather, (e) collision
resolution, (f) the full fused step — each as its own jit, hard-synced
by fetching a scalar. This tells us where the ~100ns/event goes.
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
from khmer_tpu.core import sketch_kernels as K
from khmer_tpu.ops import hashing as H

CHUNK = 1 << 21
KSIZE = 20
NBLOCKS = int(K.get_n_primes_near_x(1, int(5e7) * 4 // 128 + 1)[0])


def timeit(name, fn, *args, reps=10):
    t0 = time.time()
    out = fn(*args)
    s = jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.uint32)
                if jax.tree_util.tree_leaves(out)[0].dtype != jnp.uint64
                else jax.tree_util.tree_leaves(out)[0])
    _ = int(s.ravel()[0]) if s.shape else int(s)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    s = jnp.sum(leaf.astype(jnp.uint32) if leaf.dtype == jnp.uint8 else leaf)
    _ = int(s.ravel()[0]) if s.shape else int(s)
    dt = (time.time() - t0) / reps
    W = CHUNK - KSIZE + 1
    print("%-28s %8.2f ms  %6.1f ns/event  (compile+1st %.1fs)"
          % (name, dt * 1e3, dt / W * 1e9, compile_s), file=sys.stderr)
    return dt


def main():
    dev = jax.devices()[0]
    print("device: %s  nblocks=%d" % (dev, NBLOCKS), file=sys.stderr)
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, CHUNK, dtype=np.uint8))
    starts = jnp.asarray(
        np.arange(0, CHUNK, 150, dtype=np.int32)[:CHUNK // 8])
    starts = jnp.concatenate([
        starts, jnp.full(CHUNK // 8 - starts.shape[0], CHUNK, jnp.int32)]) \
        if starts.shape[0] < CHUNK // 8 else starts[:CHUNK // 8]
    codes = jax.device_put(codes, dev)
    starts = jax.device_put(starts, dev)
    W = CHUNK - KSIZE + 1

    # (a) hashing only
    @jax.jit
    def stage_hash(codes):
        return H.hash_windows(codes, KSIZE, "twobit")

    timeit("hash_windows(twobit)", stage_hash, codes)

    @jax.jit
    def stage_hash_m(codes):
        return H.hash_windows(codes, KSIZE, "murmur")

    timeit("hash_windows(murmur)", stage_hash_m, codes)

    hashes = stage_hash(codes)
    valid = jnp.ones(W, bool)

    # (b) run stats (sort + dedup)
    @jax.jit
    def stage_runstats(hashes, valid):
        return K._run_stats(hashes, valid)

    timeit("run_stats(sort+dedup)", stage_runstats, hashes, valid)

    table = jnp.zeros((NBLOCKS, B.LANES), jnp.uint8)
    table = jax.device_put(table, dev)

    # (c) one-hot row scatter-add only
    @jax.jit
    def stage_scatter(table, hashes, valid):
        block = (hashes % np.uint64(NBLOCKS)).astype(jnp.int32)
        safe_block = jnp.where(valid, block, jnp.int32(NBLOCKS))
        offq = B._offsets(hashes)
        M = hashes.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (M, B.SUB, B.QUART), 2)
        onehot = lane == jnp.transpose(offq)[:, :, None]
        rows = jnp.where(onehot, 1, 0).reshape(M, B.LANES)
        delta = jnp.zeros((NBLOCKS, B.LANES), jnp.int32).at[safe_block].add(
            rows, mode="drop")
        return jnp.minimum(table.astype(jnp.int32) + delta,
                           255).astype(jnp.uint8)

    timeit("onehot row scatter-add", stage_scatter, table, hashes, valid)

    # (c2) scatter-min of event index
    @jax.jit
    def stage_scatter_min(hashes, valid):
        block = (hashes % np.uint64(NBLOCKS)).astype(jnp.int32)
        safe_block = jnp.where(valid, block, jnp.int32(NBLOCKS))
        offq = B._offsets(hashes)
        M = hashes.shape[0]
        idx = jnp.arange(M, dtype=jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (M, B.SUB, B.QUART), 2)
        onehot = lane == jnp.transpose(offq)[:, :, None]
        rows = jnp.where(onehot, idx[:, None, None],
                         jnp.int32(B.IDX_FILL)).reshape(M, B.LANES)
        return jnp.full((NBLOCKS, B.LANES), jnp.int32(B.IDX_FILL)).at[
            safe_block].min(rows, mode="drop")

    timeit("onehot row scatter-min", stage_scatter_min, hashes, valid)

    # (d) packed image + row gather
    @jax.jit
    def stage_gather(table, hashes, valid):
        block = (hashes % np.uint64(NBLOCKS)).astype(jnp.int32)
        safe_block = jnp.where(valid, block, jnp.int32(NBLOCKS))
        offq = B._offsets(hashes)
        M = hashes.shape[0]
        g = table.at[safe_block].get(mode="fill",
                                     fill_value=0).astype(jnp.int32)
        gv = B._select_lanes(g.reshape(M, B.SUB, B.QUART), offq)
        return jnp.sum(gv, axis=0)

    timeit("row gather + lane select", stage_gather, table, hashes, valid)

    # (f) full fused step
    from khmer_tpu.core import pipeline
    step = pipeline.make_flat_consume("blocked", (NBLOCKS,), KSIZE,
                                      "twobit")

    def full(table, codes, starts):
        t, nu, nc, ov, _ = step((table,), jnp.uint64(0),
                                jnp.zeros((), jnp.uint64),
                                jnp.zeros((), bool), codes, starts,
                                jnp.int32(CHUNK))
        return nc

    timeit("FULL blocked step", full, table, codes, starts)


if __name__ == "__main__":
    main()
