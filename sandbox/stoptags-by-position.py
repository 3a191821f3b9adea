#!/usr/bin/env python
"""Histogram where stoptags truncate reads: CSV of
(position, n_trimmed_at_position, n_reads_of_length).

Sandbox-tier equivalent of reference sandbox/stoptags-by-position.py:38-70.

% python sandbox/stoptags-by-position.py <stoptags> <reads>
"""

import sys

from _sandbox import iter_records

from khmer_tpu import Nodegraph

K = 32


def main():
    ht = Nodegraph(K, 1, 1)

    x = [0] * 255
    y = [0] * 255

    ht.load_stop_tags(sys.argv[1])
    for n, record in enumerate(iter_records(sys.argv[2])):
        if n % 10000 == 0:
            sys.stderr.write('... %d\n' % n)

        s, p = ht.trim_on_stoptags(record.sequence)

        if len(s) == len(record.sequence):
            continue

        if p == 0:
            p = K - 1
        else:
            p += 1

        x[p] += 1
        y[len(record.sequence)] += 1

    for i, (n, m) in enumerate(zip(x, y)):
        if m:
            print('%d,%d,%d' % (i, n, m))


if __name__ == '__main__':
    main()
