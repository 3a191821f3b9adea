"""GraphLabels breadth battery.

Mirrors the reference's tests/test_labelhash.py behaviors (label
counting, tag<->label linking by hash and by string, save/load incl.
wrong-ksize and corruption paths, sweeps, A<->B<->C overlap labeling)
against this repo's GraphLabels(graph) API.
"""

import os

import pytest

from khmer_tpu import GraphLabels, Nodegraph

from .script_utils import get_test_data

TAG = 173473779682          # the single tag of single-read.fq at k=20
SWEEP_SEQ = "CAGGCGCCCACCACCGTGCCCTCCAACCTGATGGT"


def make_labels(k=20, size=1e7, nt=4):
    return GraphLabels(Nodegraph(k, size, nt))


def test_n_labels_after_labeled_consume():
    lh = make_labels()
    lh.consume_seqfile_and_tag_with_labels(get_test_data("test-labels.fa"))
    assert lh.n_labels == 4


def test_labels_enumerates_read_ordinals():
    lh = make_labels()
    lh.consume_seqfile_and_tag_with_labels(get_test_data("test-labels.fa"))
    assert sorted(lh.labels()) == [0, 1, 2, 3]


def test_save_load_roundtrip(tmp_path):
    lh = make_labels()
    lh.consume_seqfile_and_tag_with_labels(get_test_data("test-labels.fa"))
    p = str(tmp_path / "saved.labels")
    lh.save_labels_and_tags(p)
    lh2 = make_labels()
    lh2.load_labels_and_tags(p)
    assert sorted(lh2.labels()) == [0, 1, 2, 3]
    assert lh2.graph.all_tags == lh.graph.all_tags


def test_load_wrong_ksize_fails(tmp_path):
    lh = GraphLabels(Nodegraph(19, 1e7, 4))
    lh.consume_seqfile_and_tag_with_labels(get_test_data("test-labels.fa"))
    p = str(tmp_path / "saved.labels")
    lh.save_labels_and_tags(p)
    lh2 = make_labels(k=20)
    with pytest.raises(OSError) as err:
        lh2.load_labels_and_tags(p)
    assert "Incorrect k-mer size 19" in str(err.value)


def test_load_corrupted_fails(tmp_path):
    lh = make_labels()
    lh.consume_seqfile_and_tag_with_labels(get_test_data("test-labels.fa"))
    p = str(tmp_path / "saved.labels")
    lh.save_labels_and_tags(p)
    data = open(p, "rb").read()
    for n in (2, 6, 10, len(data) // 2):
        trunc = str(tmp_path / ("t%d.labels" % n))
        with open(trunc, "wb") as fh:
            fh.write(data[:n])
        with pytest.raises((OSError, ValueError, Exception)):
            make_labels().load_labels_and_tags(trunc)


def test_load_wrong_filetype_fails(tmp_path):
    ng = Nodegraph(20, 1e4, 4)
    ng.add_tag(TAG)
    p = str(tmp_path / "x.tagset")
    ng.save_tagset(p)
    with pytest.raises(OSError):
        make_labels().load_labels_and_tags(p)


def test_get_tag_labels_known_tag():
    lh = make_labels()
    lh.consume_seqfile_and_tag_with_labels(get_test_data("single-read.fq"))
    labels = list(lh.get_tag_labels(TAG))
    assert labels == [0]


def test_get_labels_for_sequence_matches_tag_labels():
    lh = make_labels()
    path = get_test_data("single-read.fq")
    lh.consume_seqfile_and_tag_with_labels(path)
    from khmer_tpu.io.fastx import FastxParser
    seq = next(iter(FastxParser(path))).sequence
    assert list(lh.get_labels_for_sequence(seq)) == \
        list(lh.get_tag_labels(TAG)) == [0]


def test_link_tag_and_label_by_hash():
    lh = make_labels(size=1, nt=1)
    lh.graph.add_tag(TAG)
    lh.link_tag_and_label(TAG, 1)
    assert list(lh.get_tag_labels(TAG)) == [1]


def test_link_tag_and_label_by_string():
    lh = make_labels(size=1, nt=1)
    kmer = lh.graph.reverse_hash(TAG)
    lh.graph.add_tag(kmer)
    lh.link_tag_and_label(lh.graph.hash(kmer), 1)
    # query by string AND by hash must agree
    assert list(lh.get_tag_labels(kmer)) == [1]
    assert list(lh.get_tag_labels(TAG)) == [1]


def test_sweep_tag_neighborhood():
    lh = make_labels()
    lh.graph.consume_seqfile_and_tag(get_test_data("single-read.fq"))
    tags = lh.graph.sweep_tag_neighborhood(SWEEP_SEQ)
    assert list(tags) == [TAG]


def test_sweep_label_neighborhood():
    lh = make_labels()
    lh.consume_seqfile_and_tag_with_labels(get_test_data("single-read.fq"))
    labels = list(lh.sweep_label_neighborhood(SWEEP_SEQ))
    assert labels == [0]


def test_label_tag_correctness_overlap_chain():
    # test-labels.fa: reads A <-> B <-> C overlap; D stands alone.
    # Sweeping a read's sequence finds its neighbors' labels
    # (reference test_label_tag_correctness oracle sets).
    lh = make_labels(size=1e7, nt=4)
    lh.consume_seqfile_and_tag_with_labels(get_test_data("test-labels.fa"))
    # query sequences from the reference oracle (overlap A+B, A+B+C,
    # C only via B, D alone)
    query_a = ("ATCGTGTAAGCTATCGTAATCGTAAGCTCTGCCTAGAGCTAGGCTAGGCTCTGCC"
               "TAGAGCTAGGCTAGGTGTGCTCTGCCTAGAGCTAGGCTAGGTGT")
    query_b = ("GCGTAATCGTAAGCTCTGCCTAGAGCTAGGCTAGCTCTGCCTAGAGCTAGGCTAG"
               "GTGTTGGGGATAGATAGATAGATGACCTAGAGCTAGGCTAGGTGTTGGGGATAGA"
               "TAGATAGATGA")
    query_c = ("TGGGATAGATAGATAGATGACCTAGAGCTAGGCTAGGTGTTGGGGATAGATAGAT"
               "AGATGACCTAGAGCTAGGCTAGGTGTTGGGGATAGATAGATAGATGAGTTGGGGA"
               "TAGATAGATAGATGAGTGTAGATCCAACAACACATACA")
    query_d = "TATATATATAGCTAGCTAGCTAACTAGCTAGCATCGATCGATCGATC"
    assert set(lh.sweep_label_neighborhood(query_a)) == {0, 1}
    assert set(lh.sweep_label_neighborhood(query_b)) == {0, 1, 2}
    assert set(lh.sweep_label_neighborhood(query_c)) == {1, 2}
    assert set(lh.sweep_label_neighborhood(query_d)) == {3}


def test_consume_partitioned_with_labels(tmp_path):
    fa = str(tmp_path / "p.fa")
    with open(fa, "w") as fh:
        fh.write(">a\t3\nGGTTGACGGGGCTCAGGGGGCGGCTGACTCCGAGAGACAGCAG\n"
                 ">b\t5\nTTCTTAGCAGTCGGATGTGGGTATGCAGTACGCTAGCTACGAT\n")
    lh = make_labels()
    lh.consume_partitioned_fasta_and_tag_with_labels(fa)
    # labels are the partition ids
    assert set(lh.labels()) == {3, 5}
