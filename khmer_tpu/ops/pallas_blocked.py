"""Pallas TPU kernel for the blocked Count-Min update — EXPERIMENT.

Status: correct but NOT the production path. Measured on TPU v5e
(scripts/pallas_proto.py, 64MB table, 2^20 random events): 172
ns/event vs the XLA 3-row-op path's 47 ns/event (core/blocked.py).
Mosaic executes the per-event loop on the scalar core (~160 cycles:
scalar metadata reads, dynamic slab address calc, u8->i32 widening to
4 VREGs, a cross-lane any() reduction), while XLA's scatter lowers to
the hardware-assisted row-update path at ~18 ns/row — three of those
beat one scalar-driven fused pass. Kept as a documented negative
result and a starting point if Mosaic grows a vector gather/scatter
primitive.

The XLA path costs three priced-per-index row ops per batch —
scatter-add (counts) + scatter-min (first-toucher) + gather (credit).
This kernel fuses all of it into ONE sequential pass:

- the table is staged HBM -> VMEM once per call (input/output aliased,
  written back at the last grid step);
- per event, the 32-row aligned u8 slab holding its 128-byte block is
  loaded as a native (32,128) tile, the 4-lane one-hot increment and
  the zero-lane test run as whole-tile vector ops (widened to i32 —
  Mosaic has no i8 arithmetic), and the slab is stored back;
- sequential processing makes the new-k-mer credit EXACT by
  construction: each event sees every earlier event's increments, so
  no scatter-min/first-toucher machinery is needed;
- event metadata (block id, packed lane offsets) is blocked through
  VMEM and DMA'd into SMEM scratch per grid step (scalar reads must
  come from scalar memory, and 1-D SMEM inputs cannot be blocked).

Tables larger than the VMEM budget run as multiple passes over
block-range parts: every pass streams all events but only processes
those owned by the resident part (bid -> -1 otherwise) — events stay
in stream order, so exactness is preserved.

Availability: real TPU backends only (``available()``); everything
else falls back to the XLA path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

SLAB = 32
LANES = 128
SUBL = 8
ECOLS = 512
TILE = SUBL * ECOLS              # events per grid step
VMEM_TABLE_BUDGET = 96 << 20     # bytes of VMEM for the staged table


def available():
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    return dev.platform == "tpu"


@functools.lru_cache(maxsize=None)
def _make_update_call(nslabs):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(bids_ref, offs_ref, table_in_ref, out_ref, nnew_ref,
               scratch, sb, so, sem_in, sem_out, sem_b, sem_o):
        step = pl.program_id(0)
        nsteps = pl.num_programs(0)

        db = pltpu.make_async_copy(bids_ref, sb, sem_b)
        do = pltpu.make_async_copy(offs_ref, so, sem_o)
        db.start()
        do.start()

        @pl.when(step == 0)
        def _():
            nnew_ref[0, 0] = 0
            dma = pltpu.make_async_copy(table_in_ref, scratch, sem_in)
            dma.start()
            dma.wait()

        db.wait()
        do.wait()

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (SLAB, LANES), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (SLAB, LANES), 1)

        def body(i, acc):
            bid = sb[0, i // ECOLS, i % ECOLS]
            packed = so[0, i // ECOLS, i % ECOLS]
            v = bid >= 0
            bid = jnp.maximum(bid, 0)
            slab = bid // SLAB
            row = bid % SLAB
            o0 = packed & 127
            o1 = (packed >> 8) & 127
            o2 = (packed >> 16) & 127
            o3 = (packed >> 24) & 127
            tile32 = scratch[pl.ds(slab * SLAB, SLAB), :].astype(
                jnp.int32)
            hot = (row_iota == row) & (
                (lane_iota == o0) | (lane_iota == o1)
                | (lane_iota == o2) | (lane_iota == o3)) & v
            fresh = jnp.any(hot & (tile32 == 0))
            capped = hot & (tile32 < 255)
            scratch[pl.ds(slab * SLAB, SLAB), :] = (
                tile32 + capped.astype(jnp.int32)).astype(jnp.uint8)
            return acc + fresh.astype(jnp.int32)

        acc = jax.lax.fori_loop(0, TILE, body, jnp.int32(0))
        nnew_ref[0, 0] += acc

        @pl.when(step == nsteps - 1)
        def _():
            dma = pltpu.make_async_copy(scratch, out_ref, sem_out)
            dma.start()
            dma.wait()

    def call(bids3, offs3, table):
        nsteps = bids3.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((1, SUBL, ECOLS), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, SUBL, ECOLS), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nslabs * SLAB, LANES), jnp.uint8),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((nslabs * SLAB, LANES), jnp.uint8),
                pltpu.SMEM((1, SUBL, ECOLS), jnp.int32),
                pltpu.SMEM((1, SUBL, ECOLS), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            input_output_aliases={2: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(bids3, offs3, table)

    return call


def plan_parts(nblocks):
    """Number of block-range parts needed to fit the VMEM budget, and
    the padded per-part slab count."""
    total_bytes = nblocks * LANES
    parts = max(1, -(-total_bytes // VMEM_TABLE_BUDGET))
    part_blocks = -(-nblocks // parts)
    part_slabs = -(-part_blocks // SLAB)
    return parts, part_slabs


def event_prep(hashes, valid, nblocks, mix64):
    """XLA-side event metadata: block ids (-1 when invalid) and packed
    lane offsets."""
    NB = np.uint64(nblocks)
    block = (hashes % NB).astype(jnp.int32)
    bid = jnp.where(valid, block, jnp.int32(-1))
    m = mix64(hashes)
    packed = jnp.zeros(hashes.shape, jnp.int32)
    for t in range(4):
        off = ((m >> np.uint64(5 * t)) & np.uint64(31)).astype(
            jnp.int32) + 32 * t
        packed = packed | (off << (8 * t))
    return bid, packed


def pad_events(bid, packed):
    """Pad the event stream to a TILE multiple (invalid padding)."""
    M = bid.shape[0]
    Mp = -(-M // TILE) * TILE
    if Mp != M:
        bid = jnp.concatenate(
            [bid, jnp.full(Mp - M, jnp.int32(-1))])
        packed = jnp.concatenate(
            [packed, jnp.zeros(Mp - M, jnp.int32)])
    return (bid.reshape(Mp // TILE, SUBL, ECOLS),
            packed.reshape(Mp // TILE, SUBL, ECOLS))


def update(table_padded, n_unique, hashes, valid, nblocks, mix64):
    """Full blocked update through the Pallas kernel.

    ``table_padded``: [parts * part_slabs * SLAB, LANES] u8 (the
    blocked table padded so every part is slab-aligned). Returns
    (table_padded, n_unique).
    """
    parts, part_slabs = plan_parts(nblocks)
    bid, packed = event_prep(hashes, valid, nblocks, mix64)
    rows_per_part = part_slabs * SLAB
    call = _make_update_call(part_slabs)
    new_parts = []
    for p in range(parts):
        lo = p * rows_per_part
        pb = jnp.where((bid >= lo) & (bid < lo + rows_per_part),
                       bid - lo, jnp.int32(-1))
        b3, o3 = pad_events(pb, packed)
        part_tab = jax.lax.dynamic_slice(
            table_padded, (lo, 0), (rows_per_part, LANES))
        part_tab, nnew = call(b3, o3, part_tab)
        new_parts.append(part_tab)
        n_unique = n_unique + nnew[0, 0].astype(jnp.uint64)
    table_padded = jnp.concatenate(new_parts, axis=0)
    return table_padded, n_unique
