#!/usr/bin/env python
"""Per-shape cost of the fused blocked flat step.

XLA prices the row scatters per index, but the lowering quality
depends on the shape: measure ns/event-capacity for power-of-two
chunks and the 2^18-quantized odd sizes to choose the tail strategy.
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

from khmer_tpu.core import pipeline
from khmer_tpu.core import sketch_kernels as K

KSIZE = 20
NBLOCKS = int(K.get_n_primes_near_x(1, int(5e7) * 4 // 128 + 1)[0])


def main():
    print("device: %s nblocks=%d" % (jax.devices()[0], NBLOCKS),
          file=sys.stderr)
    rng = np.random.default_rng(0)
    sizes = [1 << 18, 1 << 19, 3 << 18, 1 << 20, 5 << 18, 6 << 18,
             7 << 18, 1 << 21]
    for chunk in sizes:
        codes = jnp.asarray(rng.integers(0, 4, chunk, dtype=np.uint8))
        starts_np = np.full(pipeline.FLAT_MAX_READS, 1 << 21, np.int32)
        ns = min(chunk // 150, pipeline.FLAT_MAX_READS)
        starts_np[:ns] = np.arange(0, chunk - 150, 150, np.int32)[:ns]
        starts = jnp.asarray(starts_np)
        step = pipeline.make_flat_consume("blocked", (NBLOCKS,), KSIZE,
                                          "twobit", chunk=chunk)
        state = ((jnp.zeros((NBLOCKS, 128), jnp.uint8),),
                 jnp.uint64(0), jnp.zeros((), jnp.uint64),
                 jnp.zeros((), bool))
        t0 = time.time()
        *state, _ = step(*state, codes, starts, jnp.int32(chunk))
        _ = np.asarray(state[2])  # n_consumed fetch = sync
        compile_s = time.time() - t0
        reps = max(3, (1 << 22) // chunk)
        t0 = time.time()
        for _ in range(reps):
            *state, _ = step(*state, codes, starts, jnp.int32(chunk))
        _ = np.asarray(state[2])
        dt = (time.time() - t0) / reps
        print("chunk=%8d (%5.2f x 2^18)  %8.2f ms  %6.1f ns/event  "
              "(compile %.1fs)"
              % (chunk, chunk / (1 << 18), dt * 1e3,
                 dt / chunk * 1e9, compile_s), file=sys.stderr)


if __name__ == "__main__":
    main()
