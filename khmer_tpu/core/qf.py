"""Counting quotient filter equivalent (reference: third-party/cqf/gqf.c
wrapped by QFStorage, include/oxli/storage.hh:413-458).

The reference CQF is an exact-ish counting structure over `size`
power-of-two slots; khmer indexes it with `khash % cf.range`. This
implementation reproduces the *counting semantics* (exact counts keyed by
the reduced hash) with a host-side map plus slot-occupancy accounting;
the probabilistic slot layout of the on-disk CQF is not replicated.
"""


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
