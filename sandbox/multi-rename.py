#!/usr/bin/env python
"""Rename sequences >= 200 bp with a numbered prefix, wrapping the
sequence at 80 columns; output to stdout.

Sandbox-tier equivalent of reference sandbox/multi-rename.py:42-55.

% python sandbox/multi-rename.py <prefix> <file1> [<file2> ...]
"""

import sys
import textwrap

from _sandbox import iter_records

CUTOFF = 200


def main():
    n = 0
    prefix = sys.argv[1]
    for filename in sys.argv[2:]:
        for record in iter_records(filename):
            if len(record.sequence) >= CUTOFF:
                n += 1
                print('>%s.%s %s' % (prefix, n, record.name))
                print("\n".join(textwrap.wrap(record.sequence, 80)))


if __name__ == '__main__':
    main()
