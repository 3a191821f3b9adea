#!/usr/bin/env python
"""Split a FASTA/FASTQ file into numbered chunks of <size> records:
<prefix>.0000.fa, <prefix>.0001.fa, ...

Sandbox-tier equivalent of reference sandbox/split-fasta.py:41-58.

% python sandbox/split-fasta.py <file> <prefix> <size>
"""

import sys

from _sandbox import iter_records


def main():
    filename = sys.argv[1]
    prefix = sys.argv[2]
    size = int(float(sys.argv[3]))          # e.g. 1e9

    fp = None
    division = -1
    for n, record in enumerate(iter_records(filename)):
        if n % 100000 == 0:
            print('...', n)

        if n % size == 0:
            division += 1
            new_name = '%s.%04d.fa' % (prefix, division)
            print('opening', new_name)
            if fp is not None:
                fp.close()
            fp = open(new_name, 'w')

        fp.write('>%s\n%s\n' % (record.name, record.sequence))


if __name__ == '__main__':
    main()
