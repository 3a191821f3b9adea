"""Cyclic (rolling) hash, mirroring the third-party CyclicHash used by
oxli::_hash_cyclic (src/oxli/kmer_hash.cc:210-258):

    eat(c):  h = rotl64(h, 1) ^ table[c]
    canonical = fwd + revcomp (mod 2^64)

wordsize is 64 (third-party/rollinghash/cyclichash.h:129), and the
per-character 64-bit constants are the fixed table from
characterhash.h (loaded from a binary data file).
"""

import os

import numpy as np

U64 = 0xFFFFFFFFFFFFFFFF

_TABLE = None


def _table():
    global _TABLE
    if _TABLE is None:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "core", "data",
            "cyclic_table.npz")
        _TABLE = np.load(path)["table"]
    return _TABLE


def _rotl1(x):
    return ((x << 1) | (x >> 63)) & U64


def _cyclic_hash_str(s):
    table = _table()
    h = 0
    for ch in s:
        h = _rotl1(h) ^ int(table[ord(ch)])
    return h


def hash_cyclic(kmer, k):
    """oxli::_hash_cyclic canonical = fwd + revcomp (mod 2^64)."""
    from khmer_tpu.ops.hashing import reverse_complement

    h = _cyclic_hash_str(kmer)
    r = _cyclic_hash_str(reverse_complement(kmer))
    return (h + r) & U64


def hash_cyclic_forward(kmer, k):
    return _cyclic_hash_str(kmer)


def hash_cyclic_windows(seq, k):
    """Canonical cyclic hashes for all k-windows (host-side)."""
    n = len(seq)
    W = n - k + 1
    out = np.zeros(W, dtype=np.uint64)
    for i in range(W):
        out[i] = hash_cyclic(seq[i:i + k], k)
    return out
