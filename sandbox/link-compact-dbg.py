#!/usr/bin/env python
"""Extract the compact de Bruijn graph with label links and save GML.

Sandbox-tier equivalent of reference sandbox/link-compact-dbg.py:
36-196: like extract-compact-dbg, but additionally labels reads across
high-degree nodes and collects the label sets touching each linear
path while traversing.

% python sandbox/link-compact-dbg.py -o out.gml <seqfiles...>
"""

import argparse
import sys

from _sandbox import iter_records  # noqa: F401

from khmer_tpu import GraphLabels, Nodegraph, calc_expected_collisions

ecd = __import__('extract-compact-dbg')
GmlWriter = ecd.GmlWriter
Pathfinder = ecd.Pathfinder

DEFAULT_KSIZE = 31
NODEGRAPH_SIZE = 8e8


def traverse_and_mark_linear_paths(graph, nk, stop_bf, pathy,
                                   degree_nodes, lh):
    stop_filter = None
    if stop_bf is not None:
        stop_filter = lambda c: stop_bf.get(c)  # noqa: E731
    size, conns, visited = graph.traverse_linear_path(
        nk, set(degree_nodes), stop_filter=stop_filter)
    if not size:
        return

    # labels seen anywhere along this linear path
    linear_path_labels = set()
    for node in visited:
        linear_path_labels.update(lh.get_tag_labels(node))

    path_id = pathy.new_linear_segment(size)
    for conn in conns:
        conn_id = pathy.segments_r.get(conn)
        if conn_id is not None:
            pathy.add_adjacency(path_id, conn_id)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('seqfiles', nargs='+')
    parser.add_argument('-o', '--output', default=None)
    parser.add_argument('-k', '--ksize', default=DEFAULT_KSIZE, type=int)
    parser.add_argument('-x', '--tablesize', default=NODEGRAPH_SIZE,
                        type=float)
    parser.add_argument('--force', action='store_true')
    args = parser.parse_args()

    assert args.ksize % 2, "ksize must be odd"
    assert args.output, "you probably want an output file"

    print('building graphs and loading files', file=sys.stderr)

    graph = Nodegraph(args.ksize, args.tablesize, 2)
    stop_bf = Nodegraph(args.ksize, args.tablesize, 2)
    stop_bf2 = Nodegraph(args.ksize, args.tablesize, 2)
    n = 0

    for seqfile in args.seqfiles:
        for record in iter_records(seqfile):
            n += 1
            if n % 10000 == 0:
                print('...', seqfile, n, file=sys.stderr)
            graph.consume(record.sequence)

    calc_expected_collisions(graph, args.force, max_false_pos=.05)

    pathy = Pathfinder(args.ksize)

    print('finding high degree nodes', file=sys.stderr)
    degree_nodes = set()
    n = 0
    for seqfile in args.seqfiles:
        for record in iter_records(seqfile):
            n += 1
            if n % 10000 == 0:
                print('...2', seqfile, n, file=sys.stderr)
            if min(stop_bf2.get_kmer_counts(record.sequence)) == 0:
                stop_bf2.consume(record.sequence)
                degree_nodes |= graph.find_high_degree_nodes(
                    record.sequence)
    del stop_bf2

    if not degree_nodes:
        print('no high degree nodes; exiting.', file=sys.stderr)
        sys.exit(0)

    lh = GraphLabels(graph)
    n = 0
    for seqfile in args.seqfiles:
        for record in iter_records(seqfile):
            n += 1
            if n % 10000 == 0:
                print('...3', seqfile, n, file=sys.stderr)
            lh.label_across_high_degree_nodes(record.sequence,
                                              degree_nodes, n)

    print('num labels:', lh.n_labels, file=sys.stderr)

    for node in degree_nodes:
        pathy.new_segment(node)

    print('traversing linear segments from', len(degree_nodes), 'nodes',
          file=sys.stderr)

    for n, kmer in enumerate(degree_nodes):
        if n % 10000 == 0:
            print('...', n, 'of', len(degree_nodes), file=sys.stderr)
        k_id = pathy.segments_r[kmer]
        for nk in graph.neighbors(kmer):
            if nk in degree_nodes:
                pathy.add_adjacency(k_id, pathy.segments_r[nk])
            else:
                traverse_and_mark_linear_paths(graph, nk, stop_bf, pathy,
                                               degree_nodes, lh)

    print(len(pathy.segments), 'segments, containing',
          sum(pathy.segments.values()), 'nodes')

    if args.output:
        print('saving to', args.output, file=sys.stderr)
        with open(args.output, 'w') as fp:
            w = GmlWriter(fp)
            for k, v in pathy.segments.items():
                w.add_vertex(k, v)
            for k, v in pathy.adjacencies.items():
                for edge in v:
                    w.add_edge(k, edge)
            w.done()


if __name__ == '__main__':
    main()
