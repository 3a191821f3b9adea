"""Counting quotient filter equivalent (reference: third-party/cqf/gqf.c
wrapped by QFStorage, include/oxli/storage.hh:413-458).

The reference CQF is an exact-ish counting structure over `size`
power-of-two slots; khmer indexes it with `khash % cf.range`. This
implementation reproduces the *counting semantics* (exact counts keyed by
the reduced hash) with a host-side map plus slot-occupancy accounting.

On-disk format: the OXLI v4 SAVED_QFCOUNT header and the gqf metadata
fields exactly as QFStorage::save writes them (storage.cc:919-955,
gqf.h:64-76); the block section stores the (key, count) pairs
deterministically sorted instead of the reference's raw qfblock dump
(which encodes the same multiset in the rank-and-select slot layout).
Round-trips through this module preserve all counts exactly.
"""

import struct


class QuotientFilter:
    def __init__(self, size):
        # gqf uses nslots = size, range = nslots << 8 (remainder bits)
        self.nslots = int(size)
        self.range = self.nslots << 8
        self._counts = {}

    def _key(self, h):
        return h % self.range

    def insert(self, h, count=1):
        k = self._key(h)
        self._counts[k] = self._counts.get(k, 0) + count

    def count(self, h):
        return self._counts.get(self._key(h), 0)

    @property
    def n_unique(self):
        return len(self._counts)

    @property
    def n_occupied(self):
        return len(self._counts)

    # -- OXLI SAVED_QFCOUNT persistence ---------------------------------

    def _metadata(self):
        """gqf metadata fields as qf_init computes them for
        (nslots, key_bits=log2(nslots)+8, value_bits=0)
        (third-party/cqf/gqf.c qf_init; storage.hh:418-424)."""
        key_bits = self.nslots.bit_length() - 1 + 8
        key_remainder_bits = 8
        bits_per_slot = key_remainder_bits  # value_bits = 0
        # gqf qf_init: floor(nslots + 10*sqrt(nslots)) — truncate after
        # the multiply, not before (matters for odd log2(nslots))
        xnslots = int(self.nslots + 10 * self.nslots ** 0.5)
        slots_per_block = 64
        nblocks = (xnslots + slots_per_block - 1) // slots_per_block
        return dict(nslots=self.nslots, xnslots=xnslots,
                    key_bits=key_bits, value_bits=0,
                    key_remainder_bits=key_remainder_bits,
                    bits_per_slot=bits_per_slot, range=self.range,
                    nblocks=nblocks)

    def save(self, f, ksize):
        """Write the SAVED_QFCOUNT body (after the OXLI type byte):
        ksize u8, then the 11 gqf metadata words (storage.cc:936-946),
        then the sorted (key u64, count u64) pairs."""
        md = self._metadata()
        nelts = sum(self._counts.values())
        f.write(struct.pack("<B", ksize))
        f.write(struct.pack(
            "<11Q", md["nslots"], md["xnslots"], md["key_bits"],
            md["value_bits"], md["key_remainder_bits"],
            md["bits_per_slot"], md["range"], md["nblocks"],
            nelts, len(self._counts), len(self._counts)))
        for key in sorted(self._counts):
            f.write(struct.pack("<QQ", key, self._counts[key]))

    @classmethod
    def load(cls, f):
        """Read a SAVED_QFCOUNT body; returns (filter, ksize).

        Only this module's deterministic (key, count)-pair payload is
        accepted. A file written by the reference shares the identical
        OXLI header and metadata words but stores a raw qfblock dump
        whose size differs from ndistinct*16, so it is detected and
        rejected rather than silently misparsed.
        """
        def read_exact(n):
            data = f.read(n)
            if len(data) != n:
                raise OSError("Unexpected end of k-mer count file")
            return data

        (ksize,) = struct.unpack("<B", read_exact(1))
        fields = struct.unpack("<11Q", read_exact(88))
        (nslots, _xnslots, _key_bits, _value_bits, _krb, _bps,
         range_, _nblocks, _nelts, ndistinct, _nocc) = fields
        qf = cls(nslots)
        if qf.range != range_:
            raise OSError("inconsistent quotient filter header")
        payload = f.read()
        if len(payload) != ndistinct * 16:
            raise OSError(
                "unsupported quotient filter payload (raw gqf qfblock "
                "dumps from the reference implementation cannot be "
                "loaded; re-save with this library)")
        for i in range(ndistinct):
            key, count = struct.unpack_from("<QQ", payload, i * 16)
            qf._counts[key] = count
        return qf, ksize
