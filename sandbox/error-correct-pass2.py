#!/usr/bin/env python
"""Pass 2 of graph-based error correction.

Given the countgraph produced by a diginorm pass, align each read to
the graph with the trusted/untrusted HMM aligner and replace the read
with its graph-side alignment when the alignment covers the full read.
Corrected (and uncorrectable-but-complete) reads land in
``<basename readfile>.corr`` or -o.  Behavioral peer of the
reference's pass-2 corrector (trusted cutoff 2, theta 1.0).

usage: python sandbox/error-correct-pass2.py [-o OUT] <counts.ct> <reads>
"""

import os
import sys

from _sandbox import ticker  # noqa: F401  (repo-root sys.path setup)

from khmer_tpu import ReadAligner, load_countgraph
from khmer_tpu.cli import args as khmer_args
from khmer_tpu.cli.args import FileType as khFileType
from khmer_tpu.core import pipeline
from khmer_tpu.io.fastx import Record, write_record

TRUSTED_CUTOFF = 2


class GraphCorrector:
    """Correct reads by full-length graph alignment."""

    def __init__(self, graph, trusted_cov, theta):
        self.aligner = ReadAligner(graph, trusted_cov, theta)
        self.n_corrected = 0

    def correct(self, seq):
        """Graph-side sequence for a full-length alignment, or the
        input when the alignment truncates."""
        _score, graph_aln, _read_aln, truncated = self.aligner.align(seq)
        if truncated:
            return seq
        fixed = graph_aln.replace("-", "")
        if fixed != seq:
            self.n_corrected += 1
        return fixed


def corrected_record(record, seq):
    """Rebuild the record around the corrected sequence; quality is
    clipped to the sequence (alignment can lengthen it)."""
    quality = getattr(record, "quality", None)
    if quality:
        quality = quality[: len(seq)]
        return Record(name=record.name, sequence=seq[: len(quality)],
                      quality=quality)
    return Record(name=record.name, sequence=seq)


def main(argv=None):
    parser = khmer_args.build_counting_args(
        "Correct reads against an already-computed table",
        citations=["counting", "SeqAn"])
    parser.add_argument("--trusted-cov", dest="trusted_cov", type=int,
                        default=TRUSTED_CUTOFF)
    parser.add_argument("--theta", dest="bits_theta", type=float,
                        default=1.0)
    parser.add_argument("-o", "--output", dest="output_file",
                        help="output file for corrected reads; "
                             "defaults to <readfile>.corr in cwd.",
                        type=khFileType("w"), default=None)
    parser.add_argument("counts_table")
    parser.add_argument("readfile")
    args = parser.parse_args(argv)

    print("loading counts")
    graph = load_countgraph(args.counts_table)
    corrector = GraphCorrector(graph, args.trusted_cov, args.bits_theta)
    print("trusted:", args.trusted_cov)

    out = args.output_file
    if not out:
        out = open(os.path.basename(args.readfile) + ".corr", "w")

    for n, record in enumerate(pipeline.records_from(args.readfile)):
        if n % 10000 == 0:
            print("...", n, corrector.n_corrected, file=sys.stderr)
        seq = record.sequence.replace("N", "A")
        write_record(corrected_record(record, corrector.correct(seq)),
                     out)


if __name__ == "__main__":
    main()
