#!/usr/bin/env python
"""Test sorted/unique-hinted scatter+gather performance on TPU."""
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

P = 49999991
M = 2097152 - 19


def timeit(fn, *args, reps=3, name=""):
    s = fn(*args)
    _ = float(np.asarray(s))
    t0 = time.time()
    for _i in range(reps):
        s = fn(*args)
    _ = float(np.asarray(s))
    dt = (time.time() - t0) / reps
    print(f"{name:52s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    bins_np = (rng.integers(0, 2**63, M, dtype=np.uint64) % P).astype(
        np.int32)
    bins = jnp.asarray(bins_np)
    bins_sorted = jnp.asarray(np.sort(bins_np))
    table = jnp.zeros(P, jnp.uint8)
    _ = float(np.asarray(jnp.sum(bins.astype(jnp.int64)).astype(jnp.f4)
                         if False else bins[0]))

    def sc_add(b):
        return jnp.zeros(P, jnp.int32).at[b].add(1)[0]
    timeit(jax.jit(sc_add), bins, name="scatter-add unsorted")

    def sc_add_sorted(b):
        return jnp.zeros(P, jnp.int32).at[b].add(
            1, indices_are_sorted=True)[0]
    timeit(jax.jit(sc_add_sorted), bins_sorted,
           name="scatter-add sorted-hint")

    def sc_add_sorted_uniq(b):
        return jnp.zeros(P, jnp.int32).at[b].add(
            1, indices_are_sorted=True, unique_indices=True)[0]
    timeit(jax.jit(sc_add_sorted_uniq), bins_sorted,
           name="scatter-add sorted+unique-hint")

    def sc_set_sorted_uniq(b):
        return jnp.zeros(P, jnp.uint8).at[b].set(
            jnp.uint8(1), indices_are_sorted=True, unique_indices=True)[0]
    timeit(jax.jit(sc_set_sorted_uniq), bins_sorted,
           name="scatter-set sorted+unique-hint")

    def ga(b):
        return table.at[b].get(mode="fill", fill_value=0).astype(
            jnp.int32)[0]
    timeit(jax.jit(ga), bins, name="gather unsorted")

    def ga_sorted(b):
        return table.at[b].get(mode="fill", fill_value=0,
                               indices_are_sorted=True).astype(
            jnp.int32)[0]
    timeit(jax.jit(ga_sorted), bins_sorted, name="gather sorted-hint")

    def sort32(b):
        return jnp.sort(b)[0]
    timeit(jax.jit(sort32), bins, name="sort i32 M")

    def sort32_pair(b):
        e = jnp.arange(M, dtype=jnp.int32)
        bs, es = jax.lax.sort((b, e), num_keys=1)
        return bs[0] + es[0]
    timeit(jax.jit(sort32_pair), bins, name="sort (i32,i32) pair")

    # fused: sort + run-length + hinted scatter of uniques
    def fused_count(b):
        e = jnp.arange(M, dtype=jnp.int32)
        bs, es = jax.lax.sort((b, e), num_keys=1)
        first = (jnp.arange(M) == 0) | (bs != jnp.roll(bs, 1))
        seg = jnp.cumsum(first.astype(jnp.int32)) - 1
        cnt = jax.ops.segment_sum(jnp.ones(M, jnp.int32), seg,
                                  num_segments=M,
                                  indices_are_sorted=True)
        ubins = jax.ops.segment_max(bs, seg, num_segments=M,
                                    indices_are_sorted=True)
        nuniq = jnp.sum(first.astype(jnp.int32))
        ubins = jnp.where(jnp.arange(M) < nuniq, ubins, P)
        tbl = jnp.zeros(P, jnp.int32).at[ubins].add(
            cnt, mode="drop", indices_are_sorted=True,
            unique_indices=True)
        return tbl[0]
    timeit(jax.jit(fused_count), bins, name="sort+dedup+hinted scatter")


if __name__ == "__main__":
    main()
