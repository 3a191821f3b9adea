"""High-level helper functions (reference: oxli/functions.py).

The reference spawns N threads over a shared parser; here consumption
already streams through the batched device pipeline, so build_graph is
a thin sequential driver.
"""


def build_graph(ifilenames, graph, num_threads=1, tags=False):
    """Construct a (node|count)graph from a set of input files.

    - ifilenames: list of input files
    - graph: existing graph
    - num_threads: accepted for API parity (device batching replaces
      thread parallelism)
    - tags: also build the tagset while consuming
    """
    eat = graph.consume_seqfile_and_tag if tags else \
        graph.consume_seqfile
    for ifile in ifilenames:
        eat(ifile)


def estimate_optimal_with_K_and_M(num_kmers, mem_cap):
    from khmer_tpu.cli.args import estimate_optimal_with_K_and_M as f

    return f(num_kmers, mem_cap)


def estimate_optimal_with_K_and_f(num_kmers, des_fp_rate):
    from khmer_tpu.cli.args import estimate_optimal_with_K_and_f as f

    return f(num_kmers, des_fp_rate)


def optimal_size(num_kmers, mem_cap=None, fp_rate=None):
    from khmer_tpu.cli.args import optimal_size as f

    return f(num_kmers, mem_cap=mem_cap, fp_rate=fp_rate)
