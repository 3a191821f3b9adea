#!/usr/bin/env python
"""Renumber partition annotations into one consecutive ID space.

Reads one or more partition-annotated FASTA files (read names end in
"\\t<pid>"), assigns fresh consecutive partition ids starting at 2
across all inputs, and writes each input back out as gzipped
groupNNN.fa.gz. Behavioral contract of reference
sandbox/renumber-partitions.py:42-66.

% python sandbox/renumber-partitions.py <file1.part> [<file2.part> ...]
"""

import gzip
import itertools
import os.path
import sys

from _sandbox import iter_records

PROGRESS_EVERY = 10000


def renumber_stream(records, fresh_ids, mapping, logname):
    """Yield '>name\\tnewpid\\nseq\\n' chunks, renumbering via `mapping`
    (shared across calls) and drawing unseen ids from `fresh_ids`."""
    for n, record in enumerate(records):
        if n and n % PROGRESS_EVERY == 0:
            print('...', logname, n)
        fields = record.name.split()
        pid = mapping.setdefault(fields[-1], None)
        if pid is None:
            pid = mapping[fields[-1]] = next(fresh_ids)
        yield '>%s\t%d\n%s\n' % (fields[0], pid, record.sequence)


def main(argv=None):
    inputs = (argv if argv is not None else sys.argv[1:])
    fresh_ids = itertools.count(2)
    for filenum, filename in enumerate(inputs, start=1):
        mapping = {}
        outname = 'group%03d.fa.gz' % filenum
        with gzip.open(outname, 'wt') as outfp:
            for chunk in renumber_stream(iter_records(filename), fresh_ids,
                                         mapping,
                                         os.path.basename(filename)):
                outfp.write(chunk)
        print('renumbered %d partitions in %s' % (len(mapping), filename))


if __name__ == '__main__':
    main()
