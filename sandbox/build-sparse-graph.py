#!/usr/bin/env python
"""Build a sparse tag graph with graph-tool from labeled tag sweeps
and draw it (requires the optional graph_tool package).

Sandbox-tier equivalent of reference sandbox/build-sparse-graph.py:37-100.

% python sandbox/build-sparse-graph.py <ksize> <tablesize> <input_fasta>
"""

import sys

from _sandbox import iter_records

from khmer_tpu import GraphLabels, Nodegraph

try:
    import graph_tool.all as gt
except ImportError:
    gt = None


def main():
    input_fasta = sys.argv[3]
    ksize = int(sys.argv[1])
    tablesize = float(sys.argv[2])

    if gt is None:
        print("build-sparse-graph.py requires the graph_tool package",
              file=sys.stderr)
        sys.exit(1)

    ht = Nodegraph(ksize, tablesize, 4)
    lh = GraphLabels(ht)

    sparse_graph = gt.Graph()
    hashes = sparse_graph.new_vertex_property("long long")

    for n, record in enumerate(iter_records(input_fasta)):
        if n % 1000 == 0:
            print('...loaded and tagged {} sequences'.format(n),
                  file=sys.stderr)
        sequence = record.sequence

        lh._consume_sequence_and_tag_with_labels(sequence, n)
        tags = ht.sweep_tag_neighborhood(sequence, 0)
        for i in range(len(tags) - 1):
            src = tags[i]
            dst = tags[i + 1]

            new = False

            srcv = gt.find_vertex(sparse_graph, hashes, src)
            if not srcv:
                srcv = sparse_graph.add_vertex()
                hashes[srcv] = src
                new = True
            else:
                srcv = srcv[0]

            dstv = gt.find_vertex(sparse_graph, hashes, dst)
            if not dstv:
                dstv = sparse_graph.add_vertex()
                hashes[dstv] = dst
                new = True
            else:
                dstv = dstv[0]

            if new:
                sparse_graph.add_edge(srcv, dstv)

    print('Sparse graph has {} nodes, {} edges'.format(
        sparse_graph.num_vertices(), sparse_graph.num_edges()))
    comp = gt.label_largest_component(sparse_graph, directed=False)
    gt.graph_draw(sparse_graph, output_size=(5000, 5000),
                  output=input_fasta + '_sparse.png')
    sparse_graph.set_vertex_filter(comp)
    gt.graph_draw(sparse_graph, output_size=(5000, 5000),
                  output=input_fasta + '_sparse_comp.png')


if __name__ == '__main__':
    main()
