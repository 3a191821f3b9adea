from khmer_tpu.io.fastx import (
    FastxParser,
    Record,
    ReadParser,
    open_maybe_compressed,
    write_record,
    write_record_pair,
)
from khmer_tpu.io.pairing import (
    BrokenPairedReader,
    UnpairedReadsError,
    broken_paired_reader,
    check_is_left,
    check_is_pair,
    check_is_right,
)

__all__ = [
    "BrokenPairedReader",
    "FastxParser",
    "ReadParser",
    "Record",
    "UnpairedReadsError",
    "broken_paired_reader",
    "check_is_left",
    "check_is_pair",
    "check_is_right",
    "open_maybe_compressed",
    "write_record",
    "write_record_pair",
]
