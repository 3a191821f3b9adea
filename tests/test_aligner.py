"""ReadAligner tests; oracles from the reference
tests/test_read_aligner.py."""

from khmer_tpu import Countgraph
from khmer_tpu.core.aligner import ReadAligner


def test_graph_attribute():
    ch = Countgraph(10, 1048576, 1)
    aligner = ReadAligner(ch, 0, 0)
    assert aligner.graph is ch


def test_alignnocov():
    # reference test_read_aligner.py::test_alignnocov
    ch = Countgraph(10, 1048576, 1)
    read = "ACCTAGGTTCGACATGTACC"
    aligner = ReadAligner(ch, trusted_cov_cutoff=0, bits_theta=0)
    for _ in range(20):
        ch.consume("AGAGGGAAAGCTAGGTTCGACAAGTCCTTGACAGAT")
    ch.consume("ACCTAGGTTCGACATGTACC")
    _, graphAlign, readAlign, trunc = aligner.align(read)
    assert readAlign == 'ACCTAGGTTCGACATGTACC'
    assert graphAlign == 'ACCTAGGTTCGACATGTACC'


def test_readalign():
    # reference test_read_aligner.py::test_readalign
    ch = Countgraph(10, 1048576, 1)
    aligner = ReadAligner(ch, 1, 0)
    for i in range(20):
        ch.consume("AGAGGGAAAGCTAGGTTCGACAAGTCCTTGACAGAT")
    read = "ACCTAGGTTCGACATGTACC"
    ch.consume("GCTTTTAAAAAGGTTCGACAAAGGCCCGGG")
    score, graphAlign, readAlign, _ = aligner.align(read)
    assert readAlign == 'ACCTAGGTTCGACATGTACC', readAlign
    assert graphAlign == 'AGCTAGGTTCGACAAGTCCT', graphAlign


def test_defaults():
    assert len(ReadAligner._default_transition_probabilities()) == 28
    assert len(ReadAligner._default_scoring_matrix()) == 4
