"""Host->device streaming pipeline: pack reads, hash, commit batches.

This is the TPU-native replacement for the reference's threaded
consume_seqfile loop (src/oxli/hashtable.cc:125-274): instead of N
pthreads hammering shared tables with atomics, reads are packed on host
into fixed-shape [B, L] 2-bit code tensors (shape-bucketed to bound
recompilation), hashed on device with vectorized rolling/murmur kernels,
and committed through the exact batched update pipeline in sketch_kernels.

Batches are committed strictly in stream order, so path-dependent
statistics (n_unique_kmers, bigcount) match the reference's sequential
semantics exactly.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from khmer_tpu.core import sketch_kernels as K
from khmer_tpu.ops import hashing as H

# default batch geometry
TARGET_KMERS = 1 << 19
MAX_ROW_LEN = 4096
_L_LADDER = [64, 128, 256, 512, 1024, 2048, 4096]


def _bucket_len(n):
    for b in _L_LADDER:
        if n <= b:
            return b
    return MAX_ROW_LEN


def _bucket_rows(n):
    b = 64
    while b < n:
        b *= 2
    return b


class Batcher:
    """Pack cleaned sequences into shape-bucketed [B, L] code batches.

    Long sequences are split into MAX_ROW_LEN chunks overlapping by k-1 so
    every k-window is preserved, in order.
    """

    def __init__(self, k, target_kmers=TARGET_KMERS):
        self.k = k
        self.target = target_kmers
        self._rows = []   # list of (codes np.uint8 [n], n)
        self._kmers = 0
        self._maxlen = 0

    def add(self, seq):
        """Add one cleaned sequence; returns packed batch if full."""
        k = self.k
        n = len(seq)
        if n > MAX_ROW_LEN:
            out = []
            step = MAX_ROW_LEN - (k - 1)
            for s in range(0, n, step):
                chunk = seq[s:s + MAX_ROW_LEN]
                if len(chunk) < k and s > 0:
                    break
                b = self.add(chunk)
                if b is not None:
                    out.append(b)
            return out if out else None
        codes = H.encode_dna(seq)
        self._rows.append(codes)
        self._maxlen = max(self._maxlen, n)
        self._kmers += max(0, n - k + 1)
        if self._kmers >= self.target:
            return self.flush()
        return None

    def flush(self):
        """Pack and clear accumulated rows; None if empty."""
        if not self._rows:
            return None
        L = _bucket_len(max(self._maxlen, self.k))
        B = _bucket_rows(len(self._rows))
        codes = np.zeros((B, L), dtype=np.uint8)
        lengths = np.zeros(B, dtype=np.int32)
        for i, row in enumerate(self._rows):
            codes[i, : len(row)] = row
            lengths[i] = len(row)
        self._rows = []
        self._kmers = 0
        self._maxlen = 0
        return codes, lengths

    def __bool__(self):
        return bool(self._rows)


@functools.lru_cache(maxsize=None)
def make_hash_batch(k, hash_family, with_fr=False):
    """[B, L] codes + [B] lengths -> [B, W] canonical hashes + valid mask."""

    @jax.jit
    def fn(codes, lengths):
        W = codes.shape[-1] - k + 1
        canon, f, r = (H.rolling_hash_windows(codes, k)
                       if hash_family == "twobit"
                       else H.murmur_hash_windows(codes, k))
        win = jnp.arange(W, dtype=jnp.int32)[None, :]
        valid = win <= (lengths[:, None] - k)
        if with_fr:
            return canon, f, r, valid
        return canon, valid

    return fn


def _band_filter(hashes, valid, num_bands, band):
    lo, hi = H.compute_band_interval(num_bands, band)
    return valid & (hashes >= np.uint64(lo)) & (hashes < np.uint64(hi))


@functools.lru_cache(maxsize=None)
def make_mask_filter(mask_kind, mask_primes, threshold, consume_masked):
    """Keep k-mers whose count in the mask table passes the threshold.

    reference: hashtable.cc:175-183 (consume iff count <= threshold, or
    count >= threshold when consume_masked).
    """
    @jax.jit
    def fn(mask_tables, hashes, valid):
        counts = K._gather_counts(mask_kind, mask_primes, mask_tables,
                                  hashes)
        if consume_masked:
            return valid & (counts >= threshold)
        return valid & (counts <= threshold)

    return fn


def records_from(source):
    """Normalize a path / parser / record-iterable into a record iterator."""
    from khmer_tpu.io.fastx import FastxParser

    if isinstance(source, str):
        return FastxParser(source)
    return source


def consume_seqfile(sketch, source, mask=None, threshold=0,
                    consume_masked=False, num_bands=None, band=None,
                    callback=None, callback_every=None):
    """Count every k-mer of every read; returns (n_reads, n_consumed).

    Mirrors Hashtable::consume_seqfile and its _with_mask / _banding
    variants (src/oxli/hashtable.cc:125-274).
    """
    k = sketch.ksize()
    batcher = Batcher(k)
    hash_fn = make_hash_batch(k, sketch.hash_family)
    mask_fn = None
    if mask is not None:
        mask_fn = make_mask_filter(mask.storage_kind, mask._primes,
                                   int(threshold), bool(consume_masked))
    n_reads = 0
    n_consumed = 0

    def commit(batch):
        nonlocal n_consumed
        if batch is None:
            return
        if isinstance(batch, list):
            for b in batch:
                commit(b)
            return
        codes, lengths = batch
        hashes, valid = hash_fn(jnp.asarray(codes), jnp.asarray(lengths))
        if num_bands:
            valid = _band_filter(hashes, valid, num_bands, band)
        if mask_fn is not None:
            valid = mask_fn(mask.tables, hashes, valid)
        sketch._commit_device_hashes(hashes, valid)
        n_consumed += int(jnp.sum(valid))

    for record in records_from(source):
        seq = record.cleaned_seq
        n_reads += 1
        if len(seq) >= k:
            commit(batcher.add(seq))
        if callback is not None and callback_every \
                and n_reads % callback_every == 0:
            callback(n_reads)
    commit(batcher.flush())
    return n_reads, n_consumed


def abundance_distribution(main, source, tracking):
    """Histogram of k-mer counts over reads, deduplicated by `tracking`.

    Mirrors Hashtable::abundance_distribution (hashtable.cc:451-502):
    per k-mer in stream order, if tracking says unseen, track it and
    histogram the main count. Returns a list of MAX_BIGCOUNT+1 ints.
    """
    k = main.ksize()
    if tracking.ksize() != k:
        raise ValueError("tracking table k-size must match")
    batcher = Batcher(k)
    hash_fn = make_hash_batch(k, main.hash_family)
    step = K.make_abund_dist(tracking.storage_kind, tracking._primes,
                             main.storage_kind, main._primes)
    dist = jnp.zeros(K.MAX_BIGCOUNT + 2, dtype=jnp.uint64)
    sat_hashes = []

    def commit(batch):
        nonlocal dist
        if batch is None:
            return
        if isinstance(batch, list):
            for b in batch:
                commit(b)
            return
        codes, lengths = batch
        hashes, valid = hash_fn(jnp.asarray(codes), jnp.asarray(lengths))
        tt, dist2, n_sat, sat_hash = step(
            tracking.tables, dist, main.tables,
            hashes.ravel(), valid.ravel())
        tracking.tables = tt
        dist = dist2
        n_sat = int(n_sat)
        if n_sat:
            if n_sat > sat_hash.shape[0]:
                raise RuntimeError("too many saturated k-mers in one batch")
            hs = np.asarray(sat_hash)
            sat_hashes.extend(int(h) for h in hs
                              if h != 0xFFFFFFFFFFFFFFFF)

    for record in records_from(source):
        seq = record.cleaned_seq
        if len(seq) >= k:
            commit(batcher.add(seq))
    commit(batcher.flush())

    out = np.asarray(dist[: K.MAX_BIGCOUNT + 1]).astype(np.uint64)
    # saturated counts resolve through the host-side bigcount map
    for h in sat_hashes:
        c = main._bigcounts.get(h, K.MAX_KCOUNT) if main._use_bigcount \
            else K.MAX_KCOUNT
        out[min(c, K.MAX_BIGCOUNT)] += 1
    return [int(x) for x in out]


def counts_for_records(sketch, records):
    """Batched per-read k-mer count arrays; yields (record, counts np).

    Count arrays include host-side bigcount fixup. Reads shorter than k
    yield an empty array.
    """
    k = sketch.ksize()
    get_fn = sketch._get_fn()
    hash_fn = make_hash_batch(k, sketch.hash_family)
    pending = []
    batcher = Batcher(k)

    def process(batch):
        if batch is None:
            counts = hs = None
        else:
            codes, lengths = batch
            hashes, valid = hash_fn(jnp.asarray(codes),
                                    jnp.asarray(lengths))
            counts = np.asarray(get_fn(sketch.tables,
                                       hashes)).astype(np.uint32)
            hs = (np.asarray(hashes)
                  if sketch._use_bigcount and sketch._bigcounts else None)
        i = 0
        for rec in pending:
            n = len(rec.cleaned_seq) - k + 1
            if n <= 0:
                yield rec, np.zeros(0, dtype=np.uint32)
                continue
            c = counts[i, :n].copy()
            if hs is not None:
                sat = c == K.MAX_KCOUNT
                for j in np.nonzero(sat)[0]:
                    c[j] = sketch._bigcounts.get(int(hs[i, j]),
                                                 K.MAX_KCOUNT)
            yield rec, c
            i += 1
        pending.clear()

    for record in records:
        seq = record.cleaned_seq
        if len(seq) >= k:
            if len(seq) > MAX_ROW_LEN:
                if pending:
                    yield from process(batcher.flush())
                # long reads take the scalar path
                yield record, sketch.get_counts_for_hashes(
                    sketch._hashes_for_sequence(seq))
                continue
            pending.append(record)
            batch = batcher.add(seq)
            if batch is not None:
                yield from process(batch)
        else:
            pending.append(record)
    if pending:
        yield from process(batcher.flush())
