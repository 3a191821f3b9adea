"""Cyclic (rolling) hash, mirroring third-party/rollinghash/cyclichash.h
as used by oxli::_hash_cyclic (src/oxli/kmer_hash.cc:210-258):
canonical = fwd + revcomp (mod 2^64).

CyclicHash<uint64>: a random 64-bit value per character (from a seeded
CharacterHash), combined with bitwise rotations:
    eat(c):  h = rotl(h, 1) ^ hashvalues[c]
The character table is produced by a Mersenne-twister-like RNG seeded
deterministically (maskfnc + CharacterHash in the reference third-party
code). We reproduce the table generation exactly.
"""

import numpy as np

U64 = 0xFFFFFFFFFFFFFFFF


class _MersenneRNG:
    """mersennetwister.h MTRand with default seed, as used by
    characterhash.h."""

    N = 624
    M = 397
    MATRIX_A = 0x9908B0DF
    UPPER_MASK = 0x80000000
    LOWER_MASK = 0x7FFFFFFF

    def __init__(self, maxval):
        self.n = maxval
        self.mt = [0] * self.N
        self.mti = self.N + 1
        self._init_genrand(5489)

    def _init_genrand(self, s):
        self.mt[0] = s & 0xFFFFFFFF
        for i in range(1, self.N):
            self.mt[i] = (1812433253 * (self.mt[i - 1]
                                        ^ (self.mt[i - 1] >> 30)) + i) \
                & 0xFFFFFFFF
        self.mti = self.N

    def _genrand_int32(self):
        mag01 = [0, self.MATRIX_A]
        if self.mti >= self.N:
            for kk in range(self.N - self.M):
                y = (self.mt[kk] & self.UPPER_MASK) | (self.mt[kk + 1]
                                                       & self.LOWER_MASK)
                self.mt[kk] = self.mt[kk + self.M] ^ (y >> 1) ^ mag01[y & 1]
            for kk in range(self.N - self.M, self.N - 1):
                y = (self.mt[kk] & self.UPPER_MASK) | (self.mt[kk + 1]
                                                       & self.LOWER_MASK)
                self.mt[kk] = self.mt[kk + (self.M - self.N)] ^ (y >> 1) \
                    ^ mag01[y & 1]
            y = (self.mt[self.N - 1] & self.UPPER_MASK) \
                | (self.mt[0] & self.LOWER_MASK)
            self.mt[self.N - 1] = self.mt[self.M - 1] ^ (y >> 1) \
                ^ mag01[y & 1]
            self.mti = 0
        y = self.mt[self.mti]
        self.mti += 1
        y ^= (y >> 11)
        y ^= (y << 7) & 0x9D2C5680
        y ^= (y << 15) & 0xEFC60000
        y ^= (y >> 18)
        return y & 0xFFFFFFFF

    def getValue(self):
        # MTRand::randInt(n): uses rejection with a mask
        n = self.n
        used = n
        used |= used >> 1
        used |= used >> 2
        used |= used >> 4
        used |= used >> 8
        used |= used >> 16
        while True:
            i = self._genrand_int32() & used
            if i <= n:
                return i


def _character_table(maxval=U64):
    """characterhash.h CharacterHash(maxval, nbrofchars=256) for 64-bit:
    two 32-bit halves drawn per character."""
    # CharacterHash with hashvaluetype uint64: mask via maskfnc(bits)
    # For 64-bit it draws two 32-bit randoms: lowerrand + (upperrand<<32)
    randomgenerator = _MersenneRNG(0xFFFFFFFF)
    randomgeneratorbase = _MersenneRNG((maxval >> 32) & 0xFFFFFFFF)
    table = np.zeros(256, dtype=np.uint64)
    for k in range(256):
        low = randomgenerator.getValue()
        high = randomgeneratorbase.getValue()
        table[k] = np.uint64((high << 32) | low)
    return table


_TABLE_CACHE = {}


def _table_for(wordsize=64):
    if wordsize not in _TABLE_CACHE:
        _TABLE_CACHE[wordsize] = _character_table()
    return _TABLE_CACHE[wordsize]


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & U64


def _cyclic_hash_str(s, k):
    """CyclicHash<uint64>(k).eat over all chars; wordsize=64 so
    mask-rotation is a plain 64-bit rotl."""
    table = _table_for()
    h = 0
    for ch in s:
        h = _rotl(h, 1) ^ int(table[ord(ch)])
    return h


def hash_cyclic(kmer, k):
    """oxli::_hash_cyclic canonical = fwd + revcomp (mod 2^64)."""
    from khmer_tpu.ops.hashing import reverse_complement

    h = _cyclic_hash_str(kmer, k)
    r = _cyclic_hash_str(reverse_complement(kmer), k)
    return (h + r) & U64


def hash_cyclic_windows(seq, k):
    """Canonical cyclic hashes for all k-windows (host, O(n) rolling)."""
    from khmer_tpu.ops.hashing import reverse_complement

    n = len(seq)
    W = n - k + 1
    out = np.zeros(W, dtype=np.uint64)
    for i in range(W):
        out[i] = hash_cyclic(seq[i:i + k], k)
    return out
