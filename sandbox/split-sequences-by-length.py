#!/usr/bin/env python
"""Split sequences into per-length output files.

Each distinct sequence length gets its own file named
<base>.NNN where NNN = 1000 - length (zero-padded), so longer
sequences sort first in a directory listing. Behavioral contract of
reference sandbox/split-sequences-by-length.py:45-86.

% python sandbox/split-sequences-by-length.py <base> <data1> [<data2> ...]
"""

import sys

from _sandbox import iter_records

PROGRESS_EVERY = 10000


def demultiplex(records, open_for_length):
    """Route records to per-length sinks; returns records written."""
    n = 0
    for record in records:
        sink = open_for_length(len(record.sequence))
        sink.write('>%s\n%s\n' % (record.name, record.sequence))
        n += 1
        if n % PROGRESS_EVERY == 0:
            print('...', n)
    return n


def main():
    base, filenames = sys.argv[1], sys.argv[2:]
    sinks = {}

    def open_for_length(length):
        if length not in sinks:
            sinks[length] = open('%s.%03d' % (base, 1000 - length), 'w')
        return sinks[length]

    total = 0
    for filename in filenames:
        print('opening')
        total += demultiplex(iter_records(filename), open_for_length)


if __name__ == '__main__':
    main()
