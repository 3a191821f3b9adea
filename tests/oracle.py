"""Pure-Python oracle models of the reference storage semantics.

These reimplement include/oxli/storage.hh add/get sequentially, one
event at a time, to validate that the batched device pipelines are
sequential-equivalent (counts, n_unique, n_occupied, bigcount).
"""

MAX_KCOUNT = 255
MAX_BIGCOUNT = 65535


class OracleByte:
    """ByteStorage (storage.hh:481-660)."""

    max_count = MAX_KCOUNT

    def __init__(self, primes, use_bigcount=False):
        self.primes = list(primes)
        self.tables = [dict() for _ in primes]
        self.n_unique = 0
        self.occupied = 0
        self.use_bigcount = use_bigcount
        self.bigcounts = {}

    def add(self, h):
        is_new = False
        n_full = 0
        for i, p in enumerate(self.primes):
            bin_ = h % p
            cur = self.tables[i].get(bin_, 0)
            if not is_new and cur == 0:
                is_new = True
                if i == 0:
                    self.occupied += 1
            if cur < self.max_count:
                self.tables[i][bin_] = cur + 1
            else:
                n_full += 1
        if n_full == len(self.primes) and self.use_bigcount:
            b = self.bigcounts.get(h, 0)
            if b == 0:
                self.bigcounts[h] = self.max_count + 1
            elif b < MAX_BIGCOUNT:
                self.bigcounts[h] = b + 1
        if is_new:
            self.n_unique += 1
        return is_new

    def get(self, h):
        mc = min(self.tables[i].get(h % p, 0)
                 for i, p in enumerate(self.primes))
        mc = min(mc, self.max_count)
        if mc == self.max_count and self.use_bigcount:
            return self.bigcounts.get(h, mc)
        return mc

    def table_array(self, i):
        import numpy as np

        arr = np.zeros(self.primes[i], dtype=np.uint8)
        for b, c in self.tables[i].items():
            arr[b] = c
        return arr


class OracleNibble(OracleByte):
    """NibbleStorage (storage.hh:245-405)."""

    max_count = 15

    def __init__(self, primes):
        super().__init__(primes, use_bigcount=False)

    def table_array(self, i):
        import numpy as np

        arr = np.zeros(self.primes[i] // 2 + 1, dtype=np.uint8)
        for b, c in self.tables[i].items():
            byte = b // 2
            if b % 2:
                arr[byte] |= c
            else:
                arr[byte] |= c << 4
        return arr


class OracleBit:
    """BitStorage (storage.hh:95-229)."""

    def __init__(self, primes):
        self.primes = list(primes)
        self.tables = [set() for _ in primes]
        self.n_unique = 0
        self.occupied = 0

    def add(self, h):
        is_new = False
        for i, p in enumerate(self.primes):
            bin_ = h % p
            if bin_ not in self.tables[i]:
                if i == 0:
                    self.occupied += 1
                is_new = True
                self.tables[i].add(bin_)
        if is_new:
            self.n_unique += 1
        return is_new

    def get(self, h):
        return int(all(h % p in self.tables[i]
                       for i, p in enumerate(self.primes)))

    def table_array(self, i):
        import numpy as np

        arr = np.zeros(self.primes[i] // 8 + 1, dtype=np.uint8)
        for b in self.tables[i]:
            arr[b // 8] |= 1 << (b % 8)
        return arr
