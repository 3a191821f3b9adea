#!/usr/bin/env python
"""Histogram where stoptags truncate reads.

Loads a stoptag set, trims every read on it, and prints a CSV of
(position, reads_trimmed_at_position, reads_of_that_length) for
positions that saw any full-length reads. Behavioral contract of
reference sandbox/stoptags-by-position.py:38-70.

% python sandbox/stoptags-by-position.py <stoptags> <reads>
"""

import sys

import numpy as np

from _sandbox import iter_records

from khmer_tpu import Nodegraph

K = 32
MAXPOS = 255
PROGRESS_EVERY = 10000


def trim_position(graph, sequence):
    """Stoptag cut position for one read, or None if untrimmed.

    Mirrors the reference's reporting quirk: a cut at graph position 0
    reports K-1, any other cut reports pos+1."""
    trimmed, pos = graph.trim_on_stoptags(sequence)
    if len(trimmed) == len(sequence):
        return None
    return K - 1 if pos == 0 else pos + 1


def main():
    graph = Nodegraph(K, 1, 1)
    graph.load_stop_tags(sys.argv[1])

    cut_hist = np.zeros(MAXPOS, np.int64)
    len_hist = np.zeros(MAXPOS, np.int64)
    for n, record in enumerate(iter_records(sys.argv[2])):
        if n % PROGRESS_EVERY == 0:
            sys.stderr.write('... %d\n' % n)
        pos = trim_position(graph, record.sequence)
        if pos is not None:
            cut_hist[pos] += 1
            len_hist[len(record.sequence)] += 1

    for i in np.nonzero(len_hist)[0]:
        print('%d,%d,%d' % (i, cut_hist[i], len_hist[i]))


if __name__ == '__main__':
    main()
