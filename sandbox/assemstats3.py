#!/usr/bin/env python
"""
assemstats3 - assembly statistics (N count, total bp, max contig)
per FASTA file, above a minimum contig length.

Sandbox-tier equivalent of reference sandbox/assemstats3.py:36-153.

% python sandbox/assemstats3.py <min contig length> [ FASTA files ]
"""

import os
import sys

from _sandbox import iter_records


def trim_lens(lens, min_len):
    """Eliminate lengths below a threshold (lens sorted ascending)."""
    index = 0
    for i in range(len(lens)):
        if lens[i] < min_len:
            index += 1
        else:
            break
    return lens[index:len(lens)]


def get_lens(filename):
    """Sorted list of contig lengths."""
    return sorted(len(record.sequence) for record in iter_records(filename))


def calc_nxx(lens, percent):
    """NXX stat (e.g. N50 at percent=0.5) over a sorted lengths list."""
    lensum = sum(lens)
    threshold = (1 - percent) * lensum

    nxx = 0
    nxx_len = 0
    running_sum = 0
    for i in range(len(lens) - 1, -1, -1):
        my_len = lens[i]
        nxx += 1
        running_sum += my_len
        if running_sum >= threshold:
            nxx_len = my_len
            break

    return nxx, nxx_len


def main():
    """Output assembly statistics for provided FASTA files."""
    total_n = 0
    total_sum = 0

    if len(sys.argv) < 3:
        print("Usage: python assemstats3.py <min contig length> "
              "[ FASTA files ]")
        return

    try:
        min_len = int(sys.argv[1])
    except ValueError:
        print("Minimum contig length must be an integer.")
        return

    print('** cutoff:', min_len)
    print("N\tsum\tmax\tfilename")

    for filename in sys.argv[2:]:
        if not os.path.exists(filename):
            print("WARNING: file %s does not exist." % filename,
                  file=sys.stderr)
            continue

        trimmed_lens = trim_lens(get_lens(filename), min_len)

        if trimmed_lens:
            stat_trimmed_n = len(trimmed_lens)
            stat_sum = sum(trimmed_lens)
            stat_max = max(trimmed_lens)
        else:
            stat_trimmed_n = 0
            stat_sum = 0
            stat_max = 0

        total_n += stat_trimmed_n
        total_sum += stat_sum

        print("%d\t%d\t%d\t%s" % (stat_trimmed_n, stat_sum, stat_max,
                                  filename))

    if len(sys.argv) > 3 and total_n:
        print('--')
        print('TOTAL: %g in %d contigs (mean size %d)' % (
            total_sum, total_n, total_sum / total_n + .5))


main()
