"""In-process script runner mirroring khmer's test harness
(reference: tests/khmer_tst_utils.py:153-206)."""

import importlib
import io
import os
import shutil
import sys
import traceback
from io import StringIO

TEST_DATA = "/root/reference/tests/test-data"

SCRIPT_MODULES = {
    "load-into-counting.py": "khmer_tpu.cli.load_into_counting",
    "abundance-dist.py": "khmer_tpu.cli.abundance_dist",
    "abundance-dist-single.py": "khmer_tpu.cli.abundance_dist_single",
    "filter-abund.py": "khmer_tpu.cli.filter_abund",
    "filter-abund-single.py": "khmer_tpu.cli.filter_abund_single",
    "normalize-by-median.py": "khmer_tpu.cli.normalize_by_median",
    "trim-low-abund.py": "khmer_tpu.cli.trim_low_abund",
    "count-median.py": "khmer_tpu.cli.count_median",
    "unique-kmers.py": "khmer_tpu.cli.unique_kmers",
    "load-graph.py": "khmer_tpu.cli.load_graph",
    "do-partition.py": "khmer_tpu.cli.do_partition",
    "partition-graph.py": "khmer_tpu.cli.partition_graph",
    "merge-partitions.py": "khmer_tpu.cli.merge_partitions",
    "annotate-partitions.py": "khmer_tpu.cli.annotate_partitions",
    "extract-partitions.py": "khmer_tpu.cli.extract_partitions",
    "extract-paired-reads.py": "khmer_tpu.cli.extract_paired_reads",
    "split-paired-reads.py": "khmer_tpu.cli.split_paired_reads",
    "interleave-reads.py": "khmer_tpu.cli.interleave_reads",
    "extract-long-sequences.py": "khmer_tpu.cli.extract_long_sequences",
    "fastq-to-fasta.py": "khmer_tpu.cli.fastq_to_fasta",
    "sample-reads-randomly.py": "khmer_tpu.cli.sample_reads_randomly",
    "readstats.py": "khmer_tpu.cli.readstats",
    "filter-stoptags.py": "khmer_tpu.cli.filter_stoptags",
    "make-initial-stoptags.py": "khmer_tpu.cli.make_initial_stoptags",
    "find-knots.py": "khmer_tpu.cli.find_knots",
}


def get_test_data(name):
    return os.path.join(TEST_DATA, name)


def copy_test_data(name, tmpdir):
    dst = os.path.join(str(tmpdir), name)
    shutil.copyfile(get_test_data(name), dst)
    return dst


def runscript(scriptname, args, in_directory=None, fail_ok=False):
    """Run a CLI script in-process; returns (status, out, err)."""
    mod = importlib.import_module(SCRIPT_MODULES[scriptname])
    sysargs = [scriptname] + [str(a) for a in args]
    cwd = os.getcwd()
    status = -1
    oldargs = sys.argv
    oldout, olderr = sys.stdout, sys.stderr
    sys.argv = sysargs
    sys.stdout = StringIO()
    sys.stdout.name = "StringIO"
    # scripts writing binary records to '-' use sys.stdout.buffer
    sys.stdout.buffer = io.BytesIO()
    sys.stderr = StringIO()
    try:
        if in_directory:
            os.chdir(in_directory)
        try:
            mod.main()
            status = 0
        except SystemExit as err:
            status = err.code or 0
        except BaseException:
            # reference harness behavior (khmer_tst_utils.py:186-191):
            # uncaught exceptions land as a traceback on stderr
            traceback.print_exc(file=sys.stderr)
            status = -1
        out = sys.stdout.getvalue()
        err = sys.stderr.getvalue()
    finally:
        sys.argv = oldargs
        sys.stdout, sys.stderr = oldout, olderr
        os.chdir(cwd)
    if status != 0 and not fail_ok:
        raise AssertionError("script %s exited %s\nout:\n%s\nerr:\n%s"
                             % (scriptname, status, out, err))
    return status, out, err
