"""OXLI v4 binary format reader/writer — byte-compatible with khmer.

The normative spec is doc/dev/binary-file-formats.rst in the reference;
the implementations mirrored here are src/oxli/storage.cc (tables) and
src/oxli/hashgraph.cc:55-198,572-721 (tagsets/stoptags). Files written by
this module load in khmer and vice versa.

Layouts (little-endian):

  Countgraph (.ct):  "OXLI" ver=4 type=1 use_bigcount:u8 ksize:u32
                     n_tables:u8 occupied:u64 {tablesize:u64 bins:u8[n]}*
                     n_bigcounts:u64 {hash:u64 count:u16}*
  Nodegraph (.pt):   "OXLI" ver=4 type=2 ksize:u32 n_tables:u8 occupied:u64
                     {tablesize:u64 bins:u8[n/8+1]}*
  SmallCountgraph:   "OXLI" ver=4 type=7 ksize:u32 n_tables:u8 occupied:u64
                     {tablesize:u64 bins:u8[n/2+1]}*
  Tagset:            "OXLI" ver=4 type=3 ksize:u32 n_tags:u64
                     tag_density:u32 tags:u64[n] (ascending)
  Stoptags:          "OXLI" ver=4 type=4 ksize:u32 n_tags:u64 tags:u64[n]

Gzip variants are transparent (sniffed on read, chosen by filename on
write when the name ends in .gz).
"""

import collections
import gzip
import struct

import numpy as np

SAVED_SIGNATURE = b"OXLI"
SAVED_FORMAT_VERSION = 4
SAVED_COUNTING_HT = 1
SAVED_HASHBITS = 2
SAVED_TAGS = 3
SAVED_STOPTAGS = 4
SAVED_SUBSET = 5
SAVED_LABELSET = 6
SAVED_SMALLCOUNT = 7
SAVED_QFCOUNT = 8

_TYPE_NAMES = {
    SAVED_COUNTING_HT: "k-mer count graph",
    SAVED_HASHBITS: "k-mer graph",
    SAVED_TAGS: "tagset",
    SAVED_STOPTAGS: "stoptags",
    SAVED_SUBSET: "subset",
    SAVED_LABELSET: "labels/tags",
    SAVED_SMALLCOUNT: "small k-mer count graph",
}


def _open_read(path):
    f = open(path, "rb")
    head = f.read(2)
    f.seek(0)
    if head == b"\x1f\x8b":
        return gzip.open(f, "rb")
    return f


def _open_write(path):
    if path.endswith(".gz"):
        return gzip.open(path, "wb")
    return open(path, "wb")


def _check_header(f, expect_type, path, what):
    sig = f.read(4)
    if sig != SAVED_SIGNATURE:
        raise OSError(
            "Incorrect file signature 0x%s while reading %s from %s; "
            "should be OXLI"
            % (sig.hex(), what, path))
    version = f.read(1)[0]
    if version != SAVED_FORMAT_VERSION:
        raise OSError(
            "Incorrect file format version %d while reading %s from %s; "
            "should be %d" % (version, what, path, SAVED_FORMAT_VERSION))
    ht_type = f.read(1)[0]
    if ht_type != expect_type:
        raise OSError(
            "Incorrect file format type %d while reading %s from %s"
            % (ht_type, what, path))
    return ht_type


# --------------------------------------------------------------------------
# sketch tables
# --------------------------------------------------------------------------


def save_sketch(sketch, path):
    """Save a sketch's tables in OXLI v4 format."""
    kind = sketch.storage_kind
    raw = sketch.get_raw_tables()
    occupied = sketch.n_occupied()
    with _open_write(path) as f:
        f.write(SAVED_SIGNATURE)
        f.write(bytes([SAVED_FORMAT_VERSION]))
        if kind == "byte":
            f.write(bytes([SAVED_COUNTING_HT]))
            f.write(bytes([1 if sketch._use_bigcount else 0]))
        elif kind == "nibble":
            f.write(bytes([SAVED_SMALLCOUNT]))
        elif kind == "bit":
            f.write(bytes([SAVED_HASHBITS]))
        else:
            raise ValueError("cannot save storage kind %r" % kind)
        f.write(struct.pack("<IBQ", sketch.ksize(), len(sketch._primes),
                            occupied))
        for prime, table in zip(sketch._primes, raw):
            f.write(struct.pack("<Q", prime))
            f.write(table.tobytes())
        if kind == "byte":
            f.write(struct.pack("<Q", len(sketch._bigcounts)))
            for h in sorted(sketch._bigcounts):
                f.write(struct.pack("<QH", h, sketch._bigcounts[h]))


def _read_tables(f, path, kind, what):
    ksize, n_tables, occupied = struct.unpack("<IBQ", f.read(13))
    primes = []
    tables = []
    for _ in range(n_tables):
        (tablesize,) = struct.unpack("<Q", f.read(8))
        if kind == "byte":
            nbytes = tablesize
        elif kind == "nibble":
            nbytes = tablesize // 2 + 1
        else:
            nbytes = tablesize // 8 + 1
        data = f.read(nbytes)
        if len(data) != nbytes:
            raise OSError("Error reading from: " + path)
        primes.append(tablesize)
        tables.append(np.frombuffer(data, dtype=np.uint8))
    return ksize, primes, tables, occupied


def load_sketch(cls, path):
    """Load any OXLI table file into an instance of cls."""
    import jax.numpy as jnp

    kind = cls.storage_kind
    type_map = {"byte": SAVED_COUNTING_HT, "nibble": SAVED_SMALLCOUNT,
                "bit": SAVED_HASHBITS}
    with _open_read(path) as f:
        _check_header(f, type_map[kind], path,
                      _TYPE_NAMES[type_map[kind]])
        use_bigcount = False
        if kind == "byte":
            use_bigcount = f.read(1)[0] != 0
        ksize, primes, tables, occupied = _read_tables(f, path, kind,
                                                       "table")
        obj = cls(ksize, 1, 0, primes=primes)
        obj.tables = tuple(jnp.asarray(t) for t in tables)
        obj._use_bigcount = use_bigcount
        # preserve the saved occupied-bins header (khmer does not
        # recompute it on load; see storage.cc load paths)
        obj._occupied_offset = occupied - obj._count_nonzero_t0()
        if kind == "byte":
            (n_counts,) = struct.unpack("<Q", f.read(8))
            for _ in range(n_counts):
                h, c = struct.unpack("<QH", f.read(10))
                obj._bigcounts[h] = c
        # n_unique is not stored in the format; the reference also loses
        # it on load (storage.cc load does not restore _n_unique_kmers
        # beyond occupied bins).
        import jax.numpy as _jnp
        obj._n_unique = _jnp.uint64(0)
        return obj


def load_countgraph(path, small=False):
    from khmer_tpu.core.sketch import Countgraph, SmallCountgraph

    return load_sketch(SmallCountgraph if small else Countgraph, path)


def load_nodegraph(path):
    from khmer_tpu.core.sketch import Nodegraph

    return load_sketch(Nodegraph, path)


def load_counttable(path, small=False):
    from khmer_tpu.core.sketch import Counttable, SmallCounttable

    return load_sketch(SmallCounttable if small else Counttable, path)


def load_nodetable(path):
    from khmer_tpu.core.sketch import Nodetable

    return load_sketch(Nodetable, path)


# --------------------------------------------------------------------------
# tagsets / stoptags
# --------------------------------------------------------------------------


def save_tagset(path, ksize, tags, tag_density):
    """reference: Hashgraph::save_tagset (hashgraph.cc:55-88)."""
    arr = np.array(sorted(tags), dtype=np.uint64)
    with _open_write(path) as f:
        f.write(SAVED_SIGNATURE)
        f.write(bytes([SAVED_FORMAT_VERSION, SAVED_TAGS]))
        f.write(struct.pack("<IQI", ksize, len(arr), tag_density))
        f.write(arr.tobytes())


def load_tagset(path, expect_ksize=None):
    """Returns (tags set, tag_density)."""
    with _open_read(path) as f:
        _check_header(f, SAVED_TAGS, path, "tagset")
        (ksize,) = struct.unpack("<I", f.read(4))
        if expect_ksize is not None and ksize != expect_ksize:
            raise OSError(
                "Incorrect k-mer size %d while reading tagset from %s"
                % (ksize, path))
        n, density = struct.unpack("<QI", f.read(12))
        data = f.read(8 * n)
        if len(data) != 8 * n:
            raise OSError("Error reading data from: " + path)
        tags = set(int(x) for x in np.frombuffer(data, dtype=np.uint64))
        return tags, density


def save_stoptags(path, ksize, stop_tags):
    """reference: Hashgraph::save_stop_tags (hashgraph.cc:572-600)."""
    arr = np.array(sorted(stop_tags), dtype=np.uint64)
    with _open_write(path) as f:
        f.write(SAVED_SIGNATURE)
        f.write(bytes([SAVED_FORMAT_VERSION, SAVED_STOPTAGS]))
        f.write(struct.pack("<IQ", ksize, len(arr)))
        f.write(arr.tobytes())


def load_stoptags(path, expect_ksize=None):
    with _open_read(path) as f:
        _check_header(f, SAVED_STOPTAGS, path, "stoptags")
        (ksize,) = struct.unpack("<I", f.read(4))
        if expect_ksize is not None and ksize != expect_ksize:
            raise OSError(
                "Incorrect k-mer size %d while reading stoptags from %s"
                % (ksize, path))
        (n,) = struct.unpack("<Q", f.read(8))
        data = f.read(8 * n)
        return set(int(x) for x in np.frombuffer(data, dtype=np.uint64))


# --------------------------------------------------------------------------
# header introspection (reference: khmer/__init__.py:95-178)
# --------------------------------------------------------------------------


def extract_nodegraph_info(path):
    """(ksize, round(table_size, -2), n_tables, version, ht_type,
    occupied) — return contract mirrors the reference
    khmer/__init__.py:95-131 exactly (including the rounding)."""
    try:
        with open(path, "rb") as f:
            sig = f.read(4)
            version = f.read(1)[0]
            ht_type = f.read(1)[0]
            ksize, n_tables = struct.unpack("<IB", f.read(5))
            (occupied,) = struct.unpack("<Q", f.read(8))
            (tablesize,) = struct.unpack("<Q", f.read(8))
        if sig != SAVED_SIGNATURE:
            raise ValueError("Node graph '{}' is missing file type "
                             "signature".format(path) + str(sig))
    except ValueError:
        raise
    except Exception:
        raise ValueError("Node graph '{}' is corrupt ".format(path))
    return ksize, round(tablesize, -2), n_tables, version, ht_type, occupied


CgInfo = collections.namedtuple(
    "CgInfo", ["ksize", "n_tables", "table_size", "use_bigcount",
               "version", "ht_type", "n_occupied"])


def extract_countgraph_info(path):
    """CgInfo namedtuple; mirrors the reference
    khmer/__init__.py:134-178 (field order AND table_size rounding)."""
    try:
        with open(path, "rb") as f:
            sig = f.read(4)
            version = f.read(1)[0]
            ht_type = f.read(1)[0]
            if ht_type != SAVED_SMALLCOUNT:
                use_bigcount = f.read(1)[0]
            else:
                use_bigcount = None
            ksize, n_tables = struct.unpack("<IB", f.read(5))
            (occupied,) = struct.unpack("<Q", f.read(8))
            (tablesize,) = struct.unpack("<Q", f.read(8))
        if sig != SAVED_SIGNATURE:
            raise ValueError("Count graph file '{}' is missing file type "
                             "signature. ".format(path) + str(sig))
    except ValueError:
        raise
    except Exception:
        raise ValueError("Count graph file '{}' is corrupt ".format(path))
    return CgInfo(ksize, n_tables, round(tablesize, -2), use_bigcount,
                  version, ht_type, occupied)
