"""Tag-graph partitioning (connected components) — placeholder.

Full implementation of the reference SubsetPartition
(src/oxli/subset.cc) lands with the partitioning milestone:
find_all_tags BFS with collective frontier exchange, pmap save/load,
merge, and annotation.
"""


class SubsetPartition:
    def __init__(self, graph):
        self.graph = graph
        raise NotImplementedError(
            "partitioning lands in the partition milestone")


def find_all_tags(graph, f, r):
    raise NotImplementedError


def consume_partitioned_fasta(graph, filename):
    raise NotImplementedError
