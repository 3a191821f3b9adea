"""Partitioning pipeline tests; oracles from the reference
tests/test_scripts.py:810-1530 (exact partition IDs and counts)."""

import os

from khmer_tpu import Nodegraph, load_nodegraph
from khmer_tpu.io.fastx import FastxParser

from .script_utils import get_test_data, runscript


def _make_graph(tmp_path, infilename, min_hashsize=1e7, n_hashes=2,
                ksize=20, do_partition=False, annotate_partitions=False,
                stop_big_traverse=False):
    args = ['-x', str(min_hashsize), '-N', str(n_hashes), '-k',
            str(ksize)]
    outfile = str(tmp_path / 'out')
    args.extend([outfile, infilename])
    runscript('load-graph.py', args)
    assert os.path.exists(outfile)
    assert os.path.exists(outfile + '.tagset')

    if do_partition:
        args = [outfile]
        if stop_big_traverse:
            args.insert(0, '--no-big-traverse')
        runscript('partition-graph.py', args)
        runscript('merge-partitions.py', [outfile, '-k', str(ksize)])
        if annotate_partitions:
            runscript('annotate-partitions.py',
                      ["-k", str(ksize), outfile, infilename],
                      in_directory=str(tmp_path))
    return outfile


def test_load_graph(tmp_path):
    graphbase = _make_graph(tmp_path, get_test_data('random-20-a.fa'))
    ht = load_nodegraph(graphbase)
    ht.load_tagset(graphbase + '.tagset')
    assert ht.n_tags() > 0


def test_partition_graph_1(tmp_path):
    # reference :857-872 — exactly one partition
    graphbase = _make_graph(tmp_path, get_test_data('random-20-a.fa'))
    runscript('partition-graph.py', [graphbase])
    runscript('merge-partitions.py', [graphbase, '-k', '20'])

    final_pmap_file = graphbase + '.pmap.merged'
    assert os.path.exists(final_pmap_file)

    ht = load_nodegraph(graphbase)
    ht.load_tagset(graphbase + '.tagset')
    ht.load_partitionmap(final_pmap_file)

    x = ht.count_partitions()
    assert x == (1, 0), x


def test_partition_graph_nojoin_k21(tmp_path):
    # K=21 disconnects the reads: many partitions
    graphbase = _make_graph(tmp_path, get_test_data('random-20-a.fa'),
                            ksize=21)
    runscript('partition-graph.py', [graphbase])
    runscript('merge-partitions.py', [graphbase, '-k', '21'])
    ht = load_nodegraph(graphbase)
    ht.load_tagset(graphbase + '.tagset')
    ht.load_partitionmap(graphbase + '.pmap.merged')
    n_partitions, n_unassigned = ht.count_partitions()
    assert n_partitions == 99, n_partitions
    assert n_unassigned == 0, n_unassigned


def test_annotate_partitions(tmp_path):
    # reference :1030-1049 — partition id is exactly '2'
    seqfile = get_test_data('random-20-a.fa')
    graphbase = _make_graph(tmp_path, seqfile, do_partition=True)
    runscript('annotate-partitions.py', ["-k", "20", graphbase, seqfile],
              in_directory=str(tmp_path))
    partfile = str(tmp_path / 'random-20-a.fa.part')
    parts = [r.name.split('\t')[1] for r in FastxParser(partfile)]
    parts = set(parts)
    assert '2' in parts
    assert len(parts) == 1


def test_extract_partitions(tmp_path):
    # reference :1074-1100 — dist line '99 1 1 99'
    seqfile = get_test_data('random-20-a.fa')
    graphbase = _make_graph(tmp_path, seqfile, do_partition=True,
                            annotate_partitions=True)
    partfile = str(tmp_path / 'random-20-a.fa.part')
    runscript('extract-partitions.py', ['extracted', partfile],
              in_directory=str(tmp_path))
    distfile = str(tmp_path / 'extracted.dist')
    groupfile = str(tmp_path / 'extracted.group0000.fa')
    assert os.path.exists(distfile)
    assert os.path.exists(groupfile)
    dist = open(distfile).readline()
    assert dist.strip() == '99 1 1 99'
    parts = [r.name.split('\t')[1] for r in FastxParser(partfile)]
    assert len(parts) == 99, len(parts)
    assert len(set(parts)) == 1


def test_do_partition(tmp_path):
    # reference :1510-1526
    seqfile = get_test_data('random-20-a.fa')
    graphbase = str(tmp_path / 'out')
    runscript('do-partition.py', ["-k", "20", graphbase, seqfile],
              in_directory=str(tmp_path))
    partfile = str(tmp_path / 'random-20-a.fa.part')
    parts = [r.name.split('\t')[1] for r in FastxParser(partfile)]
    parts = set(parts)
    assert '2' in parts
    assert len(parts) == 1


def test_consume_partitioned_fasta(tmp_path):
    seqfile = get_test_data('random-20-a.fa')
    graphbase = _make_graph(tmp_path, seqfile, do_partition=True,
                            annotate_partitions=True)
    partfile = str(tmp_path / 'random-20-a.fa.part')
    ng = Nodegraph(20, 1e7, 2)
    total_reads, n_consumed = ng.consume_partitioned_fasta(partfile)
    assert total_reads == 99
    n_partitions, _ = ng.count_partitions()
    assert n_partitions == 1


def _random_seq(rng, n):
    return "".join("ACGT"[b] for b in rng.integers(0, 4, n))


def test_partition_with_abundance_separates_components():
    """Abundance-banded partitioning (reference
    tests/test_subset_graph.py:634-676, subset.cc:557-613): traversal
    only passes through k-mers inside the count band, so components of
    different coverage partition independently."""
    import numpy as np
    from khmer_tpu import Countgraph

    rng = np.random.default_rng(11)
    first = _random_seq(rng, 300)
    second = _random_seq(rng, 300)
    kh = Countgraph(20, 1e4, 4)
    for _ in range(10):
        kh.consume_and_tag(first)
    for _ in range(5):
        kh.consume_and_tag(second)
    n_tags_second = len(kh.get_tags_for_sequence(second))

    # band [8, 50] covers only `first`'s k-mers (count 10 vs 5);
    # second's tags stay unassigned (reference asserts (1, 6) the
    # same way in test_partition_on_abundance_2)
    p = kh.do_subset_partition_with_abundance(8, 50)
    assert p.count_partitions() == (1, n_tags_second)
    sizes, _ = p.partition_sizes(min_size=2)
    assert len(sizes) == 1

    # band [4, 7] covers only `second`
    p2 = kh.do_subset_partition_with_abundance(4, 7)
    sizes2, _ = p2.partition_sizes(min_size=2)
    assert len(sizes2) == 1

    # full band behaves like plain partitioning: both components
    p3 = kh.do_subset_partition_with_abundance(1, 255)
    ref = kh.do_subset_partition()
    assert p3.count_partitions() == ref.count_partitions() == (2, 0)


def test_find_all_tags_truncate_on_abundance_matches_plain():
    """With a fully covering band the truncate variant equals plain
    find_all_tags."""
    import numpy as np
    from khmer_tpu import Countgraph
    from khmer_tpu.core.partition import (find_all_tags,
                                          find_all_tags_truncate_on_abundance)
    from khmer_tpu.ops import hashing as H

    rng = np.random.default_rng(3)
    seq = _random_seq(rng, 200)
    kh = Countgraph(20, 1e4, 4)
    kh.consume_and_tag(seq)
    _, f, r = H._hash_scalar(seq[:20], 20)
    plain = find_all_tags(kh, f, r)
    banded = find_all_tags_truncate_on_abundance(kh, f, r, 1, 255)
    assert banded == plain
    # a band excluding everything finds no tags
    assert find_all_tags_truncate_on_abundance(kh, f, r, 200, 255) == set()
