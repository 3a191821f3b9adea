#!/usr/bin/env python
"""Extract the reads of one partition from a partition-annotated FASTA.

Sandbox-tier equivalent of reference
sandbox/extract-single-partition.py:40-60.

% python sandbox/extract-single-partition.py <file.part> <partition-id>
"""

import sys

from _sandbox import iter_records


def read_partition_file(filename):
    for n, record in enumerate(iter_records(filename)):
        name, partition_id = record.name.rsplit('\t', 1)
        yield n, name, int(partition_id), record.sequence


def main():
    select_pid = int(sys.argv[2])
    count = 0
    pid = select_pid
    for n, name, pid, seq in read_partition_file(sys.argv[1]):
        if pid == select_pid:
            print('>%s\t%d\n%s' % (name, pid, seq))
            count += 1

        if n % 10000 == 0:
            sys.stderr.write('...%d\n' % (n,))

    sys.stderr.write('found %d total in partition %d\n' % (count, pid))


if __name__ == '__main__':
    main()
