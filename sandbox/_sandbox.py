"""Shared prelude for sandbox-tier scripts: puts the repo root on
sys.path so `khmer_tpu` imports resolve when scripts are run in place,
and re-exports the handful of helpers every sandbox script needs.

Mirrors the reference's sandbox/ convention of importing the installed
`khmer`/`screed` packages directly (reference sandbox/README.rst).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

from khmer_tpu.io.fastx import FastxParser, write_record  # noqa: E402,F401


def iter_records(filename):
    """screed.open-equivalent: iterate Records from FASTA/FASTQ[.gz|.bz2]."""
    return FastxParser(filename)


def ticker(every=10000, fmt='... %d', out=None):
    """Progress callback: call per item, prints every `every` items."""
    state = {"n": 0}

    def tick(*extra):
        state["n"] += 1
        if state["n"] % every == 0:
            print(fmt % state["n"], *extra, file=out or sys.stdout)
        return state["n"]

    return tick


def record_windows(filename, size=8192):
    """Yield lists of records — the batching unit for the windowed
    sandbox engines (median/count sweeps run one native or device call
    per window instead of one per read)."""
    batch = []
    for record in FastxParser(filename):
        batch.append(record)
        if len(batch) >= size:
            yield batch
            batch = []
    if batch:
        yield batch


def emit_fasta(fp, name, seq, wrap=0):
    fp.write(">%s\n" % name)
    if wrap:
        for i in range(0, len(seq), wrap):
            fp.write(seq[i:i + wrap] + "\n")
    else:
        fp.write(seq + "\n")


# -- naive six-frame translation helpers shared by the streaming-assembly
# scripts (reference sandbox/assemble-and-track.py:14-67 keeps a private
# copy in each script; we share one).

GENETIC_CODE = {
    'TTT': 'F', 'TTC': 'F', 'TTA': 'L', 'TTG': 'L',
    'TCT': 'S', 'TCC': 'S', 'TCA': 'S', 'TCG': 'S',
    'TAT': 'Y', 'TAC': 'Y', 'TAA': '*', 'TAG': '*', 'TGA': '*',
    'TGT': 'C', 'TGC': 'C', 'TGG': 'W',
    'CTT': 'L', 'CTC': 'L', 'CTA': 'L', 'CTG': 'L',
    'CCT': 'P', 'CCC': 'P', 'CCA': 'P', 'CCG': 'P',
    'CAT': 'H', 'CAC': 'H', 'CAA': 'Q', 'CAG': 'Q',
    'CGT': 'R', 'CGC': 'R', 'CGA': 'R', 'CGG': 'R',
    'ATT': 'I', 'ATC': 'I', 'ATA': 'I', 'ATG': 'M',
    'ACT': 'T', 'ACC': 'T', 'ACA': 'T', 'ACG': 'T',
    'AAT': 'N', 'AAC': 'N', 'AAA': 'K', 'AAG': 'K',
    'AGT': 'S', 'AGC': 'S', 'AGA': 'R', 'AGG': 'R',
    'GTT': 'V', 'GTC': 'V', 'GTA': 'V', 'GTG': 'V',
    'GCT': 'A', 'GCC': 'A', 'GCA': 'A', 'GCG': 'A',
    'GAT': 'D', 'GAC': 'D', 'GAA': 'E', 'GAG': 'E',
    'GGT': 'G', 'GGC': 'G', 'GGA': 'G', 'GGG': 'G',
}

_COMP = {'A': 'T', 'C': 'G', 'G': 'C', 'T': 'A', 'N': 'N'}


def translate(seq):
    """Yield the six-frame peptide translations of seq."""
    def frames(s):
        for start in range(3):
            yield ''.join(GENETIC_CODE.get(s[i:i + 3], 'X')
                          for i in range(start, len(s), 3))

    for pep in frames(seq):
        yield pep
    rc = ''.join(_COMP.get(c, 'N') for c in reversed(seq))
    for pep in frames(rc):
        yield pep


def extract_orfs(pepseq, min_length=99):
    """Yield stop-free peptide stretches of at least min_length."""
    for x in pepseq.split('*'):
        if len(x) >= min_length:
            yield x
