#!/usr/bin/env python
"""Deal records round-robin into 100 numbered buckets, in reverse
rotary order (record i lands in bucket file ``prefix.(100 - i%100)``
... i.e. the file numbering runs opposite to the dealing order).

Behavioral peer of the reference's reverse-rotary shuffler; the
output-file naming (``<basename first input>.NNN``) and record->file
mapping match.

usage: python sandbox/shuffle-reverse-rotary.py <file> [<file> ...]
"""

import argparse
import os
from contextlib import ExitStack

from _sandbox import emit_fasta, iter_records, ticker

BUCKETS = 100


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="reverse-rotary shuffle into %d files" % BUCKETS)
    ap.add_argument("filenames", nargs="+")
    args = ap.parse_args(argv)

    prefix = os.path.basename(args.filenames[0])
    tick = ticker()

    with ExitStack() as stack:
        # slot s (= serial % BUCKETS) writes to file numbered
        # BUCKETS - s: the "reverse" in reverse-rotary
        sinks = [stack.enter_context(
            open("%s.%03d" % (prefix, BUCKETS - s), "w"))
            for s in range(BUCKETS)]
        total = 0
        for path in args.filenames:
            for record in iter_records(path):
                total = tick()
                emit_fasta(sinks[total % BUCKETS], record.name,
                           record.sequence)

    print("reverse-rotary shuffled %d sequences into %d files (%s.NNN)"
          % (total, BUCKETS, prefix))


if __name__ == "__main__":
    main()
