"""ctypes bindings for the native FASTA/FASTQ parser + 2-bit packer.

The shared library (src/fastx_io.cc) parses and cleans reads at memory
bandwidth; this module streams decompressed byte blocks through it and
yields numpy views. Falls back transparently when the library hasn't
been built (khmer_tpu.io.fastx is the behavioral reference).
"""

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_LIB_TRIED = False

_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "src")
_LIB_PATH = os.path.join(_SRC_DIR, "libkhmer_tpu_io.so")


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _SRC_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    for fn in (lib.fastq_pack, lib.fasta_pack):
        fn.restype = ctypes.c_longlong
        fn.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong),
        ]
    _LIB = lib
    return _LIB


def available():
    return _load() is not None


BLOCK = 8 << 20


def pack_blocks(path):
    """Yield (codes u8 array, meta i64 [n,4], name_blob bytes) blocks.

    meta rows are (seq_code_offset, seq_len, name_offset, name_len);
    offsets reference the codes array / name blob of the same block.
    """
    from khmer_tpu.io.fastx import open_maybe_compressed

    lib = _load()
    if lib is None:
        raise RuntimeError("native fastx library unavailable")

    fh = open_maybe_compressed(path)
    first = fh.read(1)
    if not first:
        return
    is_fastq = first == b"@"
    fn = lib.fastq_pack if is_fastq else lib.fasta_pack

    pending = first
    eof = False
    while not eof:
        block = fh.read(BLOCK)
        if not block:
            eof = True
        data = pending + block
        if not data:
            break
        # FASTA records only terminate at '>' or EOF: hold back the tail
        # unless we're at EOF
        buf = data
        n_bytes = len(buf)
        codes = np.empty(n_bytes, dtype=np.uint8)
        max_rec = max(n_bytes // 8, 16)
        meta = np.empty(4 * max_rec, dtype=np.int64)
        consumed = ctypes.c_longlong(0)
        codes_used = ctypes.c_longlong(0)
        if not eof and not is_fastq:
            # ensure the last (possibly incomplete) record is retried
            cut = buf.rfind(b"\n>")
            if cut < 0:
                pending = data
                continue
            buf = data[: cut + 1]
        n = fn(buf, len(buf),
               codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
               meta.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
               max_rec, ctypes.byref(consumed),
               ctypes.byref(codes_used))
        if n < 0:
            raise ValueError("malformed %s input in %s"
                             % ("FASTQ" if is_fastq else "FASTA", path))
        if n > 0:
            yield (codes[: codes_used.value],
                   meta[: 4 * n].reshape(n, 4), buf)
        leftover = data[consumed.value:] if is_fastq else \
            data[len(buf):] if not eof else data[consumed.value:]
        if is_fastq or eof:
            pending = data[consumed.value:]
        else:
            pending = leftover
        if eof and pending.strip():
            raise ValueError("trailing unparsed data in %s" % path)
