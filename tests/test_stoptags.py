"""Stoptags / knot-detection tests; oracles from the reference
tests/test_lump.py and tests/test_scripts.py."""

import os

from khmer_tpu import Countgraph, Nodegraph
from khmer_tpu.io.fastx import FastxParser

from .script_utils import copy_test_data, get_test_data, runscript


def test_filter_stoptags(tmp_path):
    # reference tests/test_scripts.py::test_filter_stoptags
    infile = copy_test_data('test-abund-read-2.fa', tmp_path)
    stopfile = str(tmp_path / 'stoptags')

    K = 18
    kh = Nodegraph(K, 1, 1)
    kh.add_stop_tag('GTTGACGGGGCTCAGGGG')
    kh.save_stop_tags(stopfile)
    del kh

    args = ['-k', str(K), stopfile, infile, infile]
    runscript('filter-stoptags.py', args, in_directory=str(tmp_path))

    outfile = infile + '.stopfilt'
    assert os.path.exists(outfile), outfile
    seqs = set(r.sequence for r in FastxParser(outfile))
    assert len(seqs) == 1, seqs


def test_fakelump_together():
    # reference tests/test_lump.py::test_fakelump_together
    fakelump_fa = get_test_data('fakelump.fa')
    ht = Nodegraph(32, 1e5, 4)
    ht.consume_seqfile_and_tag(fakelump_fa)
    subset = ht.do_subset_partition(0, 0)
    ht.merge_subset(subset)
    (n_partitions, _) = ht.count_partitions()
    assert n_partitions == 1, n_partitions


def test_fakelump_stop2():
    # reference tests/test_lump.py::test_fakelump_stop2
    fakelump_fa = get_test_data('fakelump.fa')
    ht = Nodegraph(32, 1e5, 4)
    ht.consume_seqfile_and_tag(fakelump_fa)
    ht.add_stop_tag('GGGGAGGGGTGCAGTTGTGACTTGCTCGAGAG')
    subset = ht.do_subset_partition(0, 0, True)
    ht.merge_subset(subset)
    (n_partitions, _) = ht.count_partitions()
    assert n_partitions == 3, n_partitions


def test_fakelump_repartitioning(tmp_path):
    # reference tests/test_lump.py::test_fakelump_repartitioning
    fakelump_fa = get_test_data('fakelump.fa')
    fakelump_fa_foo = str(tmp_path / 'fakelump.fa.stopfoo')

    ht = Nodegraph(32, 1e5, 4)
    ht.consume_seqfile_and_tag(fakelump_fa)
    subset = ht.do_subset_partition(0, 0)
    ht.merge_subset(subset)
    (n_partitions, _) = ht.count_partitions()
    assert n_partitions == 1, n_partitions

    EXCURSION_DISTANCE = 40
    EXCURSION_KMER_THRESHOLD = 82
    EXCURSION_KMER_COUNT_THRESHOLD = 1
    counting = Countgraph(32, 1e5, 4)

    ht.repartition_largest_partition(counting,
                                     EXCURSION_DISTANCE,
                                     EXCURSION_KMER_THRESHOLD,
                                     EXCURSION_KMER_COUNT_THRESHOLD)
    ht.save_stop_tags(fakelump_fa_foo)

    # re-do everything with these stop tags
    ht = Nodegraph(32, 1e5, 4)
    ht.consume_seqfile_and_tag(fakelump_fa)
    ht.load_stop_tags(fakelump_fa_foo)
    subset = ht.do_subset_partition(0, 0, True)
    ht.merge_subset(subset)
    (n_partitions, _) = ht.count_partitions()
    assert n_partitions == 6, n_partitions


def test_make_initial_stoptags_runs(tmp_path):
    infile = copy_test_data('fakelump.fa', tmp_path)
    graphbase = str(tmp_path / 'fakelump')
    runscript('load-graph.py',
              ['-x', '1e7', '-N', '2', '-k', '32', graphbase, infile])
    runscript('make-initial-stoptags.py',
              ['-x', '1e5', '-N', '4', '-k', '32', graphbase],
              in_directory=str(tmp_path))
    assert os.path.exists(graphbase + '.stoptags')


def test_find_knots_runs(tmp_path):
    infile = copy_test_data('fakelump.fa', tmp_path)
    graphbase = str(tmp_path / 'fakelump')
    runscript('load-graph.py',
              ['-x', '1e7', '-N', '2', '-k', '32', graphbase, infile])
    runscript('partition-graph.py', [graphbase])
    runscript('find-knots.py',
              ['-x', '1e5', '-N', '4', graphbase],
              in_directory=str(tmp_path))
    assert os.path.exists(graphbase + '.stoptags')
