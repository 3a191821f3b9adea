#!/usr/bin/env python
"""Chunk-size sweep for the blocked consume step.

The lane profile says blocked_update_core costs ~47 ns/event at 2^21
events, but bench.py sees ~87 ns/event — fixed per-dispatch cost
(axon tunnel round-trip + host sync) eats the difference. This sweeps
the chunk size to find the amortization point, and times an empty
dispatch for the per-step floor.
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

NBLOCKS = int(K.get_n_primes_near_x(1, int(5e7) * 4 // 128 + 1)[0])


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf.ravel()[:1])[0]


def main():
    dev = jax.devices()[0]
    print("device: %s nblocks=%d" % (dev, NBLOCKS), file=sys.stderr)
    rng = np.random.default_rng(0)

    # empty-dispatch floor
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((), jnp.int32)
    sync(f(x))
    t0 = time.time()
    for _ in range(20):
        sync(f(x))
    print("empty dispatch+sync: %.2f ms" % ((time.time() - t0) / 20 * 1e3),
          file=sys.stderr)

    for logm in (20, 21, 22, 23):
        M = 1 << logm
        hashes = jnp.asarray(rng.integers(0, 2**63, M, dtype=np.uint64))
        valid = jnp.ones(M, bool)
        table = jnp.zeros((NBLOCKS, B.LANES), jnp.uint8)
        upd = B.make_blocked_update(NBLOCKS)
        t0 = time.time()
        (table,), out = upd((table,), jnp.zeros((), jnp.uint64), hashes,
                            valid)
        sync(out["n_unique"])
        compile_s = time.time() - t0
        reps = max(3, (1 << 23) // M)
        t0 = time.time()
        for _ in range(reps):
            (table,), out = upd((table,), out["n_unique"], hashes, valid)
        sync(out["n_unique"])
        dt = (time.time() - t0) / reps
        print("M=2^%d  %8.2f ms  %6.1f ns/event  (compile+1st %.1fs)"
              % (logm, dt * 1e3, dt / M * 1e9, compile_s), file=sys.stderr)


if __name__ == "__main__":
    main()
