#!/usr/bin/env python
"""Stage-by-stage timing of v2_update_core on the live device."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from khmer_tpu.core import sketch_kernels as K

M = 2097152 - 19
PRIMES = tuple(K.get_n_primes_near_x(4, int(5e7)))
T = len(PRIMES)
OFFS = np.cumsum([0] + [int(p) for p in PRIMES])
SUM_P = int(OFFS[-1])
RES = M // 4


def timeit(fn, *args, reps=3, name=""):
    s = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(s)[0]).ravel()[0]
    t0 = time.time()
    for _i in range(reps):
        s = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(s)[0]).ravel()[0]
    dt = (time.time() - t0) / reps
    print(f"{name:46s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.default_rng(0)
    hashes = jnp.asarray(rng.integers(0, 2**62, M, dtype=np.uint64))
    valid = jnp.asarray(rng.random(M) < 0.6)
    tables = K.init_tables("byte", PRIMES)

    if which in ("all", "a"):
        def runstats(h, v):
            d = K._run_stats(h, v)
            return d["ucnt"][0]
        timeit(jax.jit(runstats), hashes, valid, name="a: _run_stats")

        def sort3(h, v):
            idx = jnp.arange(M, dtype=jnp.int32)
            inv = jnp.where(v, jnp.int32(0), jnp.int32(1))
            o = jax.lax.sort((inv, h, idx), num_keys=2)
            return o[0][0]
        timeit(jax.jit(sort3), hashes, valid, name="a1: 3-op sort")

        def ascan(h, v):
            idx = jnp.arange(M, dtype=jnp.int32)
            head = v
            nxt = jax.lax.associative_scan(
                jnp.minimum, jnp.where(head, idx, jnp.int32(M)),
                reverse=True)
            return nxt[0]
        timeit(jax.jit(ascan), hashes, valid, name="a2: assoc scan")

    if which in ("all", "b"):
        def scat(h, v):
            d = K._run_stats(h, v)
            gidx = jnp.stack([
                (d["uh"] % np.uint64(p) + np.uint64(OFFS[t])).astype(
                    jnp.int32) for t, p in enumerate(PRIMES)])
            sidx = jnp.where(d["head"][None, :], gidx, jnp.int32(SUM_P))
            delta = jnp.zeros(SUM_P, jnp.int32).at[sidx.ravel()].add(
                jnp.broadcast_to(d["ucnt"], (T, M)).ravel(), mode="drop")
            return delta[0]
        timeit(jax.jit(scat), hashes, valid,
               name="b: runstats+mod+concat scatter")

    if which in ("all", "c"):
        def packed_pass(tabs, h, v):
            d = K._run_stats(h, v)
            gidx = jnp.stack([
                (d["uh"] % np.uint64(p) + np.uint64(OFFS[t])).astype(
                    jnp.int32) for t, p in enumerate(PRIMES)])
            sidx = jnp.where(d["head"][None, :], gidx, jnp.int32(SUM_P))
            delta = jnp.zeros(SUM_P, jnp.int32).at[sidx.ravel()].add(
                jnp.broadcast_to(d["ucnt"], (T, M)).ravel(), mode="drop")
            old = jnp.concatenate([t.astype(jnp.int32) for t in tabs])
            packed = (old << 23) | delta
            g = packed.at[sidx].get(mode="fill", fill_value=0)
            return g[0, 0]
        timeit(jax.jit(packed_pass), tables, hashes, valid,
               name="c: ... + pack + gather")

    if which in ("all", "d"):
        collided = jnp.asarray(rng.random((T, M)) < 0.01)

        def nz(c):
            pos = jnp.nonzero(c.ravel(), size=RES,
                              fill_value=T * M)[0].astype(jnp.int32)
            return pos[0]
        timeit(jax.jit(nz), collided, name="d: nonzero(8M, size=512K)")

        def smallsort(c):
            pos = jnp.nonzero(c.ravel(), size=RES,
                              fill_value=T * M)[0].astype(jnp.int32)
            a = jax.lax.sort((pos, pos, pos, pos), num_keys=2)
            return a[0][0]
        timeit(jax.jit(smallsort), collided, name="d2: + 4-op sort 512K")

    if which in ("all", "e"):
        def full(tabs, h, v):
            tabs, n_unique, overflow, _ = K.v2_update_core(
                PRIMES, tabs, jnp.uint64(0), jnp.zeros((), bool),
                h, v, False, False)
            return n_unique
        timeit(jax.jit(full), tables, hashes, valid,
               name="e: full v2_update_core")


if __name__ == "__main__":
    main()
