#!/usr/bin/env python
"""Scatter scaling: elements vs footprint; Pallas serial RMW comparison."""
import os
import sys
import time
import functools

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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

    for M, P in [(1 << 19, 49999991), (1 << 21, 49999991),
                 (1 << 23, 49999991), (1 << 21, 999983),
                 (1 << 21, 1 << 17)]:
        bins = jnp.asarray(rng.integers(0, P, M).astype(np.int32))

        def sc(b, P=P):
            return jnp.zeros(P, jnp.int32).at[b].add(1)[0]
        timeit(jax.jit(sc), bins, name=f"scatter-add M={M} P={P}")

    # gather scaling
    P = 49999991
    tbl = jnp.zeros(P, jnp.uint8)
    for M in [1 << 19, 1 << 21, 1 << 23]:
        idx = jnp.asarray(rng.integers(0, P, M).astype(np.int32))

        def ga(t, b):
            return t.at[b].get(mode="fill", fill_value=0).astype(
                jnp.int32)[0]
        timeit(jax.jit(ga), tbl, idx, name=f"gather M={M} P={P}")

    # pallas serial scatter into a VMEM-resident histogram (small table)
    M = 1 << 21
    PT = 1 << 17  # 128K bins of i32 = 512KB VMEM

    def pallas_hist(bins):
        def kernel(b_ref, out_ref):
            out_ref[:] = jnp.zeros_like(out_ref)

            def body(i, _):
                idx = b_ref[i]
                out_ref[idx] += 1
                return 0
            jax.lax.fori_loop(0, M, body, 0)

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((PT,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(bins)[0]

    bins_small = jnp.asarray(rng.integers(0, PT, M).astype(np.int32))
    try:
        timeit(jax.jit(pallas_hist), bins_small,
               name=f"pallas serial hist M={M} P={PT}")
    except Exception as e:
        print("pallas serial hist failed:", str(e)[:300])

    # XLA scatter into same small table for comparison
    def sc_small(b):
        return jnp.zeros(PT, jnp.int32).at[b].add(1)[0]
    timeit(jax.jit(sc_small), bins_small,
           name=f"xla scatter-add M={M} P={PT}")


if __name__ == "__main__":
    main()
