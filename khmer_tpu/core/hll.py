"""HyperLogLog++ cardinality estimator (reference: src/oxli/hllcounter.cc).

Device-native design: registers are a 2^p uint8 device array; per batch of
canonical murmur hashes, the register index / rho values are computed with
vector ops and merged with a scatter-max. Merging two counters is an
elementwise max (hllcounter.cc:406-417). The bias-correction constants
(Heule et al., dx.doi.org/10.1145/2452376.2452456) are loaded from a
binary data file.
"""

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from khmer_tpu.ops import hashing as H

_DATA = None


def _bias_data():
    global _DATA
    if _DATA is None:
        path = os.path.join(os.path.dirname(__file__), "data",
                            "hll_bias.npz")
        _DATA = np.load(path)
    return _DATA


def get_threshold(p):
    return int(_bias_data()["thresholds"][p - 4])


def estimate_bias(E, p):
    """Average bias of the 6 nearest raw-estimate neighbors
    (hllcounter.cc:145-175)."""
    data = _bias_data()
    raw = data["raw_%d" % p]
    bias = data["bias_%d" % p]
    dist = (E - raw) ** 2
    order = np.lexsort((np.arange(len(raw)), dist))
    nearest = order[:6]
    return float(bias[nearest].mean())


def calc_alpha(nc):
    if nc < 16:
        raise ValueError(
            "You need at least 16 counters to use HyperLogLog. "
            "Please, set a smaller error rate (try 0.36 or above).")
    p = int(math.floor(math.log2(nc)))
    if p == 4:
        return 0.673
    if p == 5:
        return 0.697
    if p == 6:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / (1 << p))


@functools.lru_cache(maxsize=None)
def _make_add_batch(p):
    """Scatter-max a batch of hashes into the registers."""
    nc = 1 << p

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fn(counters, hashes, valid):
        index = (hashes & jnp.uint64(nc - 1)).astype(jnp.int32)
        to_count = hashes >> jnp.uint64(p)
        clz = jnp.where(to_count > 0,
                        jax.lax.clz(to_count).astype(jnp.int32), 64)
        rho = (clz - p + 1).astype(jnp.uint8)
        idx = jnp.where(valid, index, nc)
        return counters.at[idx].max(rho, mode="drop")

    return fn


class HLLCounter:
    """khmer-compatible HLLCounter."""

    def __init__(self, error_rate, ksize):
        if isinstance(error_rate, float):
            if error_rate < 0:
                raise ValueError("Please set error rate to a value "
                                 "greater than zero")
            p = math.ceil(math.log2((1.04 / error_rate) ** 2))
            nc = 1 << p
        else:
            nc = int(error_rate)
        self._init(nc, ksize)

    def _init(self, nc, ksize):
        self._alpha = calc_alpha(nc)
        self.ncounters_log2 = int(math.floor(math.log2(nc)))
        self.ncounters = nc
        self._ksize = int(ksize)
        self._counters_dev = None   # device residency
        self._counters_host = None  # host residency (native engine)
        self._touched = False

    # -- register residency (mirrors _Sketch table residency) -------------

    @property
    def counters_dev(self):
        if self._counters_dev is None:
            if self._counters_host is not None:
                self._counters_dev = jnp.asarray(self._counters_host)
            else:
                self._counters_dev = jnp.zeros(self.ncounters,
                                               dtype=jnp.uint8)
        return self._counters_dev

    @counters_dev.setter
    def counters_dev(self, value):
        self._counters_dev = value
        self._counters_host = None

    def _registers_array(self):
        """Writable host registers; host becomes the authority."""
        if self._counters_host is None:
            if self._counters_dev is not None:
                self._counters_host = np.array(self._counters_dev)
            else:
                self._counters_host = np.zeros(self.ncounters,
                                               dtype=np.uint8)
        self._counters_dev = None
        return self._counters_host

    def _adopt_registers(self, regs):
        self._counters_host = regs
        self._counters_dev = None
        self._touched = True

    def _registers_view(self):
        if self._counters_host is not None:
            return self._counters_host
        return np.asarray(self.counters_dev)

    # -- properties mirroring the Cython wrapper --------------------------

    @property
    def alpha(self):
        """Bias-correction constant (read-only, hllcounter.hh)."""
        return self._alpha

    @property
    def counters(self):
        return [int(c) for c in self._registers_view()]

    @property
    def error_rate(self):
        return 1.04 / math.sqrt(self.ncounters)

    @error_rate.setter
    def error_rate(self, error_rate):
        if self._touched:
            raise AttributeError("You can only change error rate prior to "
                                 "first counting")
        if error_rate < 0:
            raise ValueError("Please set error rate to a value "
                             "greater than zero")
        p = math.ceil(math.log2((1.04 / error_rate) ** 2))
        self._init(1 << p, self._ksize)

    @property
    def ksize(self):
        return self._ksize

    @ksize.setter
    def ksize(self, k):
        if self._touched:
            raise AttributeError("You can only change k-mer size prior to "
                                 "first counting")
        if k < 1:
            raise ValueError("Please set k-mer size to a value "
                             "greater than zero")
        self._ksize = int(k)

    def __len__(self):
        return self.estimate_cardinality()

    # -- counting ---------------------------------------------------------

    def add(self, kmer):
        """Add one k-mer string."""
        self._touched = True
        h = H._hash_murmur_scalar(kmer)[0]
        self._add_hashes(np.array([h], dtype=np.uint64))

    def _add_hashes(self, hashes, valid=None):
        self._touched = True
        hashes = np.asarray(hashes, dtype=np.uint64).ravel()
        if hashes.size == 0:
            return
        if valid is None:
            valid = np.ones(hashes.shape, bool)
        self.counters_dev = _make_add_batch(self.ncounters_log2)(
            self.counters_dev, jnp.asarray(hashes), jnp.asarray(valid))

    def _add_hashes_device(self, hashes_dev, valid_dev):
        self._touched = True
        self.counters_dev = _make_add_batch(self.ncounters_log2)(
            self.counters_dev, hashes_dev.ravel(), valid_dev.ravel())

    def consume_string(self, seq):
        """Count all k-mers; returns number consumed."""
        if len(seq) < self._ksize:
            raise ValueError("string length must >= the counter k-mer size")
        self._touched = True
        codes = H.encode_dna(seq)
        n = len(codes) - self._ksize + 1
        L = max(((len(codes) + 31) // 32) * 32, self._ksize + 31)
        padded = np.zeros(L, dtype=np.uint8)
        padded[: len(codes)] = codes
        hs, valid = _hll_seq_hash(self._ksize, L)(jnp.asarray(padded),
                                                  np.int32(len(codes)))
        self._add_hashes_device(hs, valid)
        return n

    def consume_seqfile(self, source, stream_records=False):
        """Returns (total_reads, n_consumed).

        Dispatch: the native host engine ingests the whole stream in
        one C++ pass (reference hllcounter.cc:340-404 is likewise a
        host loop); the flat device path below serves as fallback and
        as the mesh-sharded building block (parallel/hll.py).
        """
        import sys

        from khmer_tpu.core import hostengine, pipeline
        from khmer_tpu.io.fastx import write_record

        if not stream_records and hostengine.available() and \
                hostengine.mode() != "device":
            self._touched = True
            regs = self._registers_array()
            return hostengine.hll_consume(regs, self.ncounters_log2,
                                          self._ksize, source)

        k = self._ksize
        packer = pipeline.FlatPacker(k)
        flat_fn = _hll_flat_hash(k, packer.chunk)
        total_reads = 0
        n_consumed = 0

        def commit(chunks):
            nonlocal n_consumed
            for codes, starts, nfill in chunks:
                hashes, valid = flat_fn(jnp.asarray(codes),
                                        jnp.asarray(starts),
                                        jnp.int32(nfill))
                self._add_hashes_device(hashes, valid)
                n_consumed += int(jnp.sum(valid))

        for record in pipeline.records_from(source):
            if stream_records:
                write_record(record, sys.stdout)
            seq = record.cleaned_seq
            total_reads += 1
            if len(seq) >= k:
                commit(packer.add(seq))
        tail = packer.flush()
        if tail is not None:
            commit([tail])
        return total_reads, n_consumed

    consume_seqfile_with_reads_parser = consume_seqfile

    # -- estimation --------------------------------------------------------

    def estimate_cardinality(self):
        """HLL++ estimate (hllcounter.cc:237-260)."""
        counters = self._registers_view()
        V = int((counters == 0).sum())
        nc = self.ncounters
        if V > 0:
            Hlin = nc * math.log(nc / V)
            if Hlin <= get_threshold(self.ncounters_log2):
                return int(Hlin)
        s = float(np.power(2.0, -counters.astype(np.float64)).sum())
        E = self._alpha * nc * nc / s
        if E <= 5 * nc:
            return int(E - estimate_bias(E, self.ncounters_log2))
        return int(E)

    def merge(self, other):
        if (self.ncounters != other.ncounters
                or self._ksize != other._ksize):
            raise ValueError("HLLCounters to be merged must be created "
                             "with same parameters")
        self.counters_dev = jnp.maximum(self.counters_dev,
                                        other.counters_dev)


@functools.lru_cache(maxsize=None)
def _hll_flat_hash(k, chunk):
    """Flat-chunk murmur hashing with read-boundary masks (single
    compiled shape for a whole stream)."""

    @jax.jit
    def fn(codes, starts, nfill):
        W = chunk - k + 1
        rid = jnp.zeros(chunk, jnp.int32).at[starts].add(1, mode="drop")
        rid = jnp.cumsum(rid)
        valid = (rid[:W] == rid[k - 1:]) & \
            (jnp.arange(W, dtype=jnp.int32) + (k - 1) < nfill)
        canon, _, _ = H.murmur_hash_windows(codes, k)
        return canon, valid

    return fn


@functools.lru_cache(maxsize=None)
def _hll_seq_hash(k, L):
    @jax.jit
    def fn(codes, n):
        canon, _, _ = H.murmur_hash_windows(codes, k)
        W = L - k + 1
        valid = jnp.arange(W, dtype=jnp.int32) <= (n - k)
        return canon, valid

    return fn
