#!/usr/bin/env python
"""Cost of one [M,2,128]-row scatter vs two [M,128] scatters, plus a
prototype of the cond-gated fast/slow blocked core."""
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

M = 1 << 21
NB = 200_000_000 // 128
LANES = 128
SUB = 4
QUART = 32
IDX_FILL = 1 << 22


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
    print("%-34s %8.2f ms  %6.1f ns/event  (compile %.1fs)"
          % (name, dt * 1e3, dt / M * 1e9, compile_s), file=sys.stderr)
    return dt


def _onehot(off):
    lane = jax.lax.broadcasted_iota(jnp.int32, (M, SUB, QUART), 2)
    return lane == jnp.transpose(off)[:, :, None]


def _offsets(h):
    m = (h >> np.uint64(32)).astype(jnp.uint32)
    return jnp.stack([((m >> np.uint32(5 * t))
                       & np.uint32(QUART - 1)).astype(jnp.int32)
                      for t in range(SUB)])


@jax.jit
def wide_scatter(hashes, idx):
    block = (hashes % np.uint64(NB)).astype(jnp.int32)
    onehot = _onehot(_offsets(hashes))
    ones = jnp.where(onehot, 1, 0).reshape(M, 1, LANES)
    idxs = jnp.where(onehot, idx[:, None, None], 0).reshape(M, 1, LANES)
    rows = jnp.concatenate([ones, idxs], axis=1)  # [M, 2, LANES]
    return jnp.zeros((NB, 2, LANES), jnp.int32).at[block].add(
        rows, mode="drop")


@jax.jit
def fast_core(table, hashes, idx, valid):
    """Prototype: wide scatter + packed pass + one gather; cond-gated
    scatter-min slow branch."""
    block = (hashes % np.uint64(NB)).astype(jnp.int32)
    safe = jnp.where(valid, block, jnp.int32(NB))
    offq = _offsets(hashes)
    onehot = _onehot(offq)
    ones = jnp.where(onehot, 1, 0).reshape(M, 1, LANES)
    idxs = jnp.where(onehot, idx[:, None, None], 0).reshape(M, 1, LANES)
    rows = jnp.concatenate([ones, idxs], axis=1)
    s = jnp.zeros((NB, 2, LANES), jnp.int32).at[safe].add(rows, mode="drop")
    delta, idxsum = s[:, 0], s[:, 1]
    old = table.astype(jnp.int32)
    fresh = old == 0
    amb = fresh & (delta >= 2)
    n_amb = jnp.sum(amb.astype(jnp.int32))
    new_table = jnp.minimum(old + delta, 255).astype(jnp.uint8)
    packed = jnp.where(fresh & (delta == 1), (idxsum << 1) | 1, 0)
    g = packed.at[safe].get(mode="fill", fill_value=0)
    gv = jnp.transpose(jnp.sum(jnp.where(
        onehot, g.reshape(M, SUB, QUART), 0), axis=2))

    def fast(_):
        return jnp.any((gv & 1).astype(bool)
                       & ((gv >> 1) == idx[None, :]), axis=0) & valid

    def slow(_):
        rows2 = jnp.where(onehot, idx[:, None, None],
                          IDX_FILL).reshape(M, LANES)
        winner = jnp.full((NB, LANES), jnp.int32(IDX_FILL)).at[safe].min(
            rows2, mode="drop")
        p2 = jnp.where(fresh, (winner << 1) | 1, 0)
        g2 = p2.at[safe].get(mode="fill", fill_value=0)
        gv2 = jnp.transpose(jnp.sum(jnp.where(
            onehot, g2.reshape(M, SUB, QUART), 0), axis=2))
        return jnp.any((gv2 & 1).astype(bool)
                       & ((gv2 >> 1) == idx[None, :]), axis=0) & valid

    new_flags = jax.lax.cond(n_amb > 0, slow, fast, None)
    return new_table, jnp.sum(new_flags.astype(jnp.uint32))


def main():
    rng = np.random.default_rng(0)
    print("device: %s" % jax.devices()[0], file=sys.stderr)
    hashes = jnp.asarray(rng.integers(0, 2**63, M, dtype=np.uint64))
    idx = jnp.arange(M, dtype=jnp.int32)
    valid = jnp.ones(M, bool)

    timeit("wide scatter [M,2,128]", wide_scatter, hashes, idx)

    # warm table: all lanes nonzero -> fast branch
    warm = jnp.ones((NB, LANES), jnp.uint8)
    timeit("fast_core WARM (fast branch)", fast_core, warm, hashes, idx,
           valid)
    # cold table: everything fresh -> slow branch
    cold = jnp.zeros((NB, LANES), jnp.uint8)
    timeit("fast_core COLD (slow branch)", fast_core, cold, hashes, idx,
           valid)


if __name__ == "__main__":
    main()
