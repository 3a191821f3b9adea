#!/usr/bin/env python
"""Extract the compact de Bruijn graph (segments + adjacencies) and
save it as GML.

Sandbox-tier equivalent of reference sandbox/extract-compact-dbg.py:
17-230: find all degree>2 nodes, give each an ID, then walk every
linear path between them; segments become GML vertices (sized by path
length) and the HDN/path adjacencies become edges.

% python sandbox/extract-compact-dbg.py -o out.gml <seqfiles...>
"""

import argparse
import sys

from _sandbox import iter_records  # noqa: F401

from khmer_tpu import Nodegraph, calc_expected_collisions

DEFAULT_KSIZE = 31
NODEGRAPH_SIZE = 8e8


class Pathfinder:
    """Track segment IDs & adjacency lists
    (reference sandbox/extract-compact-dbg.py:17-50)."""

    def __init__(self, ksize):
        self.ksize = ksize
        self.segment_counter = 1
        self.segments = {}     # segment id -> size in nodes
        self.segments_r = {}   # kmer hash -> segment id
        self.adjacencies = {}

    def new_segment(self, kmer):
        if kmer in self.segments_r:
            return self.segments_r[kmer]
        this_id = self.segment_counter
        self.segment_counter += 1
        self.segments[this_id] = self.ksize
        self.segments_r[kmer] = this_id
        return this_id

    def new_linear_segment(self, size):
        this_id = self.segment_counter
        self.segment_counter += 1
        self.segments[this_id] = size
        return this_id

    def add_adjacency(self, node_id, adj):
        node_id, adj = min(node_id, adj), max(node_id, adj)
        self.adjacencies.setdefault(node_id, set()).add(adj)


class GmlWriter:
    """Minimal GML emitter (undirected graph of sized vertices)."""

    def __init__(self, fileobj, directed=False):
        self.file = fileobj
        self.file.write('graph [\n   directed %d\n' % (1 if directed
                                                       else 0))

    def add_vertex(self, vid, size):
        self.file.write('  node [\n    id %s\n    size %s\n  ]\n'
                        % (vid, size))

    def add_edge(self, src, dest):
        self.file.write('  edge [\n    source %s\n    target %s\n  ]\n'
                        % (src, dest))

    def done(self):
        self.file.write(']\n')


def traverse_and_mark_linear_paths(graph, nk, stop_bf, pathy,
                                   degree_nodes):
    stop_filter = None
    if stop_bf is not None:
        stop_filter = lambda c: stop_bf.get(c)  # noqa: E731
    size, conns, _visited = graph.traverse_linear_path(
        nk, set(degree_nodes), stop_filter=stop_filter)
    if not size:
        return
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
            # skip identical sequences via the dedup bloom filter
            if min(stop_bf2.get_kmer_counts(record.sequence)) == 0:
                stop_bf2.consume(record.sequence)
                degree_nodes |= graph.find_high_degree_nodes(
                    record.sequence)
    del stop_bf2

    if not degree_nodes:
        print('no high degree nodes; exiting.', file=sys.stderr)
        sys.exit(0)

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
                                               degree_nodes)

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
