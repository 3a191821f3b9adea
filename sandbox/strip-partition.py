#!/usr/bin/env python
"""Strip partition annotations (`\\tN` name suffixes) from a
partitioned FASTA, writing plain FASTA to stdout.

Sandbox-tier equivalent of reference sandbox/strip-partition.py:40-48.

% python sandbox/strip-partition.py <file.part> > <file.fa>
"""

import sys

from _sandbox import iter_records


def main():
    for record in iter_records(sys.argv[1]):
        name = record.name.split()[0]
        print('>%s\n%s' % (name, record.sequence))


if __name__ == '__main__':
    main()
