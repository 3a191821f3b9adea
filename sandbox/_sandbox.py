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
