#!/usr/bin/env python
"""Use several query read sets to sweep out overlapping reads from a
search file, one output per query set.

Sandbox-tier equivalent of reference sandbox/sweep-reads3.py:60-135:
build one nodegraph per query file, then route each search read to
every query whose graph contains any of the read's k-mers (checked via
get_median_count > 0).

% python sandbox/sweep-reads3.py <query1> [<query2> ...] <search reads>

Results end up in basename(<queryN>).sweep3.
"""

import os
import sys

from _sandbox import iter_records  # noqa: F401

from khmer_tpu import Nodegraph
from khmer_tpu.cli.args import build_nodegraph_args


def output_single(record):
    if record.quality is not None:
        return "@%s\n%s\n+\n%s\n" % (record.name, record.sequence,
                                     record.quality)
    return ">%s\n%s\n" % (record.name, record.sequence)


def main():
    parser = build_nodegraph_args(
        descr='Sweep reads overlapping multiple query sets')
    parser.add_argument('input_filenames', nargs='+')
    parser.add_argument('read_filename')
    args = parser.parse_args()

    ksize = args.ksize
    tablesize = args.max_tablesize
    n_tables = args.n_tables

    inputlist = args.input_filenames
    readsfile = args.read_filename

    query_list = []
    for inp_name in inputlist:
        ht = Nodegraph(ksize, tablesize, n_tables)
        outfile = os.path.basename(inp_name) + '.sweep3'
        outfp = open(outfile, 'w')
        query_list.append((ht, outfp))

    for n, inp_name in enumerate(inputlist):
        ht = query_list[n][0]
        print('loading input reads from', inp_name, file=sys.stderr)
        ht.consume_seqfile(inp_name)

    print('starting sweep.', file=sys.stderr)
    n = 0
    m = 0
    for record in iter_records(readsfile):
        if len(record.sequence) < ksize:
            continue
        if n % 10000 == 0:
            print('...', n, m, file=sys.stderr)
        for ht, outfp in query_list:
            count = ht.get_median_count(record.sequence)[0]
            if count:
                outfp.write(output_single(record))
        n += 1

    for _, outfp in query_list:
        outfp.close()


if __name__ == '__main__':
    main()
