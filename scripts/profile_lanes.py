#!/usr/bin/env python
"""Is the blocked row scatter index-bound or bandwidth-bound?

Times scatter-add + scatter-min + gather for row widths 32/64/128 at
equal total table memory (200MB), plus a u8-row and element-scatter
baseline. Decides the production LANES parameter.
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

import functools

import jax
import jax.numpy as jnp
import numpy as np

M = 1 << 21
TOTAL = 200_000_000  # bytes of table


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
    print("%-36s %8.2f ms  %6.1f ns/event  (compile %.1fs)"
          % (name, dt * 1e3, dt / M * 1e9, compile_s), file=sys.stderr)
    return dt


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print("device: %s  M=%d" % (dev, M), file=sys.stderr)
    hashes = jnp.asarray(rng.integers(0, 2**63, M, dtype=np.uint64))
    idx = jnp.arange(M, dtype=jnp.int32)

    for lanes in (128, 64, 32):
        nb = TOTAL // lanes
        sub = lanes // 4

        @jax.jit
        def scat_add(hashes, _nb=nb, _lanes=lanes, _sub=sub):
            block = (hashes % np.uint64(_nb)).astype(jnp.int32)
            m = (hashes >> np.uint64(32)).astype(jnp.uint32)
            off = jnp.stack([((m >> np.uint32(4 * t))
                              & np.uint32(_sub - 1)).astype(jnp.int32)
                             for t in range(4)])
            lane = jax.lax.broadcasted_iota(jnp.int32, (M, 4, _sub), 2)
            onehot = lane == jnp.transpose(off)[:, :, None]
            rows = jnp.where(onehot, 1, 0).reshape(M, _lanes)
            return jnp.zeros((_nb, _lanes), jnp.int32).at[block].add(
                rows, mode="drop")

        @jax.jit
        def scat_min(hashes, idx, _nb=nb, _lanes=lanes, _sub=sub):
            block = (hashes % np.uint64(_nb)).astype(jnp.int32)
            m = (hashes >> np.uint64(32)).astype(jnp.uint32)
            off = jnp.stack([((m >> np.uint32(4 * t))
                              & np.uint32(_sub - 1)).astype(jnp.int32)
                             for t in range(4)])
            lane = jax.lax.broadcasted_iota(jnp.int32, (M, 4, _sub), 2)
            onehot = lane == jnp.transpose(off)[:, :, None]
            rows = jnp.where(onehot, idx[:, None, None],
                             jnp.int32(1 << 22)).reshape(M, _lanes)
            return jnp.full((_nb, _lanes), jnp.int32(1 << 22)).at[
                block].min(rows, mode="drop")

        table = jnp.zeros((nb, lanes), jnp.int32)

        @jax.jit
        def gath(table, hashes, _nb=nb, _lanes=lanes, _sub=sub):
            block = (hashes % np.uint64(_nb)).astype(jnp.int32)
            g = table.at[block].get(mode="fill", fill_value=0)
            return jnp.sum(g.reshape(M, 4, _sub), axis=(1, 2))

        timeit("scatter-add  lanes=%d" % lanes, scat_add, hashes)
        timeit("scatter-min  lanes=%d" % lanes, scat_min, hashes, idx)
        timeit("row gather   lanes=%d" % lanes, gath, table, hashes)

    # u8 gather of a [nb, 128] u8 table (narrow row read)
    nb = TOTAL // 128
    table8 = jnp.zeros((nb, 128), jnp.uint8)

    @jax.jit
    def gath8(table, hashes):
        block = (hashes % np.uint64(nb)).astype(jnp.int32)
        g = table.at[block].get(mode="fill", fill_value=0)
        return jnp.sum(g.astype(jnp.int32), axis=1)

    timeit("row gather   u8 lanes=128", gath8, table8, hashes)

    # element-scatter baseline: 1 index per event into flat i32
    flat = TOTAL // 4

    @jax.jit
    def scat_el(hashes):
        b = (hashes % np.uint64(flat)).astype(jnp.int32)
        return jnp.zeros(flat, jnp.int32).at[b].add(1, mode="drop")

    timeit("element scatter-add x1", scat_el, hashes)


if __name__ == "__main__":
    main()


def profile_core():
    """Time blocked_update_core alone, then its pieces incrementally."""
    from khmer_tpu.core import blocked as B

    rng = np.random.default_rng(0)
    hashes = jnp.asarray(rng.integers(0, 2**63, M, dtype=np.uint64))
    valid = jnp.ones(M, bool)
    nb = TOTAL // 128
    table = jnp.zeros((nb, 128), jnp.uint8)

    @jax.jit
    def core(table, hashes, valid):
        tabs, nu, ov, _ = B.blocked_update_core(
            nb, (table,), jnp.uint64(0), jnp.zeros((), bool), hashes,
            valid, False)
        return tabs[0], nu

    timeit("blocked_update_core (full)", core, table, hashes, valid)

    @jax.jit
    def offsets_only(hashes):
        return B._offsets(hashes)

    timeit("mix64+offsets only", offsets_only, hashes)

    @jax.jit
    def mod_only(hashes):
        return (hashes % np.uint64(nb)).astype(jnp.int32)

    timeit("u64 mod only", mod_only, hashes)


profile_core()
