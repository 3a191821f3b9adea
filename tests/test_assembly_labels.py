"""Assembly + labeling tests (modeled on the reference
tests/test_assembly.py and tests/test_labelhash.py fixtures)."""

import random

import pytest

from khmer_tpu import (Countgraph, GraphLabels, JunctionCountAssembler,
                       LinearAssembler, Nodegraph, SimpleLabeledAssembler,
                       reverse_complement as revcomp)

K = 21


def _equals_rc(query, target):
    return query == target or revcomp(query) == target


def random_sequence(length, seed):
    random.seed(seed)
    return "".join(random.choice("ACGT") for _ in range(length))


@pytest.fixture
def linear_structure():
    contig = random_sequence(400, 101)
    graph = Countgraph(K, 1e6, 4)
    graph.consume(contig)
    return graph, contig


@pytest.fixture
def right_tip_structure():
    """A contig with a branch (tip) near the right end."""
    contig = random_sequence(400, 77)
    graph = Countgraph(K, 1e6, 4)
    graph.consume(contig)
    # add a tip: mutate the base right after position S
    S = 300
    hdn = contig[S:S + K]
    tip_seq = contig[S - 1:S + K - 1]  # left neighbor + branch base
    # tip branches off the right side of position S-1's k-mer
    mutated = contig[S + K - 1]
    alt = {"A": "C", "C": "A", "G": "T", "T": "G"}[mutated]
    tip = contig[S:S + K - 1] + alt
    graph.consume(tip)
    return graph, contig, contig[S:S + K], tip


class TestLinearAssembler:
    def test_all_start_positions(self, linear_structure):
        graph, contig = linear_structure
        asm = LinearAssembler(graph)
        for start in range(0, len(contig) - K, 150):
            path = asm.assemble(contig[start:start + K])
            assert _equals_rc(path, contig), start

    def test_all_left_to_beginning(self, linear_structure):
        graph, contig = linear_structure
        asm = LinearAssembler(graph)
        for start in range(0, len(contig) - K, 150):
            path = asm.assemble_left(contig[start:start + K])
            assert _equals_rc(path, contig[: start + K]), start

    def test_all_right_to_end(self, linear_structure):
        graph, contig = linear_structure
        asm = LinearAssembler(graph)
        for start in range(0, len(contig) - K, 150):
            path = asm.assemble_right(contig[start:start + K])
            assert _equals_rc(path, contig[start:]), start

    def test_hash_as_seed(self, linear_structure):
        graph, contig = linear_structure
        asm = LinearAssembler(graph)
        left = graph.hash(contig[:K])
        assert _equals_rc(asm.assemble(left), contig)

    def test_absent_seed(self, linear_structure):
        graph, contig = linear_structure
        asm = LinearAssembler(graph)
        assert asm.assemble("A" * K) == ""

    def test_stop_bf(self, linear_structure):
        graph, contig = linear_structure
        asm = LinearAssembler(graph)
        # block the contig midway with a stop filter
        stop_bf = Nodegraph(K, 1e5, 2)
        stop_bf.count(contig[100:100 + K])
        path = asm.assemble_right(contig[:K], stop_bf)
        assert len(path) < len(contig)

    def test_branch_stops_assembly(self, right_tip_structure):
        graph, contig, hdn, tip = right_tip_structure
        asm = LinearAssembler(graph)
        # assembling right from the beginning should stop at the branch
        path = asm.assemble_right(contig[:K])
        assert len(path) < len(contig)

    def test_graph_method(self, linear_structure):
        graph, contig = linear_structure
        path = graph.assemble_linear_path(contig[:K])
        assert _equals_rc(path, contig)


class TestGraphLabels:
    def test_consume_with_labels(self, tmp_path):
        graph = Nodegraph(K, 1e6, 4)
        lh = GraphLabels(graph)
        contig = random_sequence(400, 5)
        fa = tmp_path / "reads.fa"
        with open(fa, "w") as f:
            for i in range(4):
                f.write(">r%d\n%s\n" % (i, contig[i * 50:i * 50 + 150]))
        total, consumed = lh.consume_seqfile_and_tag_with_labels(str(fa))
        assert total == 4
        assert lh.n_labels == 4
        assert graph.n_tags() > 0

    def test_get_labels_for_sequence(self, tmp_path):
        graph = Nodegraph(K, 1e6, 4)
        lh = GraphLabels(graph)
        contig = random_sequence(300, 9)
        fa = tmp_path / "reads.fa"
        with open(fa, "w") as f:
            f.write(">r0\n%s\n" % contig)
        lh.consume_seqfile_and_tag_with_labels(str(fa))
        labels = lh.get_labels_for_sequence(contig)
        assert labels == [0]

    def test_sweep_label_neighborhood(self, tmp_path):
        graph = Nodegraph(K, 1e6, 4)
        lh = GraphLabels(graph)
        contig = random_sequence(300, 11)
        fa = tmp_path / "reads.fa"
        with open(fa, "w") as f:
            f.write(">r0\n%s\n>r1\n%s\n" % (contig[:200], contig[100:]))
        lh.consume_seqfile_and_tag_with_labels(str(fa))
        labels = lh.sweep_label_neighborhood(contig[80:220])
        assert 0 in labels and 1 in labels

    def test_save_load_labels(self, tmp_path):
        graph = Nodegraph(K, 1e6, 4)
        lh = GraphLabels(graph)
        contig = random_sequence(300, 13)
        fa = tmp_path / "reads.fa"
        with open(fa, "w") as f:
            f.write(">r0\n%s\n" % contig)
        lh.consume_seqfile_and_tag_with_labels(str(fa))
        path = str(tmp_path / "labels.bin")
        lh.save_labels_and_tags(path)

        graph2 = Nodegraph(K, 1e6, 4)
        lh2 = GraphLabels(graph2)
        lh2.load_labels_and_tags(path)
        assert lh2.n_labels == lh.n_labels
        assert sorted(lh2.tag_labels) == sorted(lh.tag_labels)


class TestJunctionCountAssembler:
    def test_consume_counts_junctions(self, right_tip_structure):
        graph, contig, hdn, tip = right_tip_structure
        asm = JunctionCountAssembler(graph)
        n = asm.consume(contig)
        # the tip creates a high-degree node -> at least one junction
        assert n >= 0


class TestSimpleLabeledAssembler:
    def test_linear_path(self, tmp_path):
        graph = Nodegraph(K, 1e6, 4)
        lh = GraphLabels(graph)
        contig = random_sequence(300, 21)
        fa = tmp_path / "reads.fa"
        with open(fa, "w") as f:
            f.write(">r0\n%s\n" % contig)
        lh.consume_seqfile_and_tag_with_labels(str(fa))
        asm = SimpleLabeledAssembler(lh)
        paths = asm.assemble(contig[:K])
        assert len(paths) == 1
        assert _equals_rc(paths[0], contig)
