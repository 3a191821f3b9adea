"""Digital normalization (diginorm) — batched, sequential-exact.

The reference algorithm (scripts/normalize-by-median.py:155-179) is
strictly sequential: each kept read updates the countgraph, changing
later keep/discard decisions. The TPU engine restores exactness with a
two-level scheme per window of read bundles:

  1. one device call hashes every read in the window and gathers its
     *per-table* bin counts from the current sketch;
  2. a host pass walks bundles in stream order, maintaining a delta map
     of (table, bin) -> adds committed within this window; each read's
     effective count is min_t(saturate(base_t + delta_t)), which equals
     what the sequential reference would see — including
     false-positive-induced decisions;
  3. kept reads' hashes are committed to the device sketch in stream
     order in one batched update at window end (n_unique/bigcount
     statistics remain path-exact).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from khmer_tpu.core import pipeline
from khmer_tpu.core import sketch_kernels as K
from khmer_tpu.ops import hashing as H

MAX_KCOUNT = K.MAX_KCOUNT


@functools.lru_cache(maxsize=None)
def make_pertable_counts(kind, primes, k, hash_family):
    """[B, L] codes -> (hashes [B, W], per-table counts [T, B, W])."""
    primes = tuple(int(p) for p in primes)

    @jax.jit
    def fn(tables, codes, lengths):
        W = codes.shape[-1] - k + 1
        hashes = H.hash_windows(codes, k, hash_family)
        win = jnp.arange(W, dtype=jnp.int32)[None, :]
        valid = win <= (lengths[:, None] - k)
        per = []
        for t, p in enumerate(primes):
            bins = hashes % np.uint64(p)
            if kind == "byte":
                c = jnp.take(tables[t], bins).astype(jnp.uint16)
            elif kind == "nibble":
                byte = jnp.take(tables[t], bins // np.uint64(2)).astype(
                    jnp.uint16)
                odd = (bins % np.uint64(2)).astype(jnp.uint16)
                c = jnp.where(odd == 1, byte & 0xF, byte >> 4)
            else:
                byte = jnp.take(tables[t], bins // np.uint64(8)).astype(
                    jnp.int32)
                bit = (jnp.int32(1)
                       << (bins % np.uint64(8)).astype(jnp.int32))
                c = ((byte & bit) != 0).astype(jnp.uint16)
            per.append(c)
        return hashes, jnp.stack(per), valid

    return fn


class BatchedNormalizer:
    """Window-batched exact diginorm engine."""

    def __init__(self, countgraph, desired_coverage, window=512):
        self.graph = countgraph
        self.C = int(desired_coverage)
        self.window = window
        self.k = countgraph.ksize()
        self._primes = tuple(countgraph._primes)
        self._nib_max = {"nibble": 15, "bit": 1}.get(
            countgraph.storage_kind, MAX_KCOUNT)

    def _eval_window(self, seqs):
        """hashes + per-table base counts for each sequence."""
        k = self.k
        fn = make_pertable_counts(self.graph.storage_kind, self._primes,
                                  k, self.graph.hash_family)
        L = max(pipeline._bucket_len(max(len(s) for s in seqs)), k + 1)
        B = pipeline._bucket_rows(len(seqs))
        codes = np.zeros((B, L), dtype=np.uint8)
        lengths = np.zeros(B, dtype=np.int32)
        for i, s in enumerate(seqs):
            c = H.encode_dna(s)
            codes[i, : len(c)] = c
            lengths[i] = len(c)
        hashes, per, valid = fn(self.graph.tables, jnp.asarray(codes),
                                jnp.asarray(lengths))
        return (np.asarray(hashes), np.asarray(per), lengths)

    def process_window(self, bundles):
        """bundles: list of lists of records (1 or 2 reads each).

        Returns, per bundle, the list of kept records — exactly as the
        sequential reference would decide.
        """
        n = len(bundles)
        kept_out = [[] for _ in range(n)]
        seqs = []
        seq_bundle = []
        for i, bundle in enumerate(bundles):
            for r in bundle:
                seqs.append(r.cleaned_seq)
                seq_bundle.append(i)
        if not seqs:
            return kept_out
        hashes, per, lengths = self._eval_window(seqs)

        k = self.k
        C = self.C
        T = len(self._primes)
        primes = self._primes
        sat = self._nib_max
        delta = {}
        commit = []

        # precompute per-seq host data
        seq_data = []
        for s in range(len(seqs)):
            nwin = int(lengths[s]) - k + 1
            h = hashes[s, :nwin]
            base = per[:, s, :nwin].astype(np.int32)  # [T, nwin]
            bins = np.empty((T, nwin), dtype=np.uint64)
            for t in range(T):
                bins[t] = h % np.uint64(primes[t])
            keys = bins + (np.arange(T, dtype=np.uint64)[:, None]
                           << np.uint64(60))
            seq_data.append((h, base, keys, nwin))

        si = 0
        for i, bundle in enumerate(bundles):
            datas = seq_data[si: si + len(bundle)]
            si += len(bundle)
            # keep iff any read's median < C  (coverages_at_least -> all)
            all_at_least = True
            for (h, base, keys, nwin) in datas:
                if nwin <= 0:
                    continue
                counts = base
                if delta:
                    adj = np.zeros_like(base)
                    flat = keys.ravel()
                    for j, key in enumerate(flat):
                        d = delta.get(int(key))
                        if d:
                            adj.flat[j] = d
                    counts = np.minimum(base + adj, sat)
                eff = counts.min(axis=0)
                min_req = int(0.5 + nwin / 2.0)
                if int((eff >= C).sum()) < min_req:
                    all_at_least = False
                    break
            if not all_at_least:
                kept_out[i] = list(bundle)
                for (h, base, keys, nwin) in datas:
                    commit.append(h)
                    for key in keys.ravel():
                        key = int(key)
                        delta[key] = delta.get(key, 0) + 1
        if commit:
            self.graph._commit_hashes(np.concatenate(commit))
        return kept_out
