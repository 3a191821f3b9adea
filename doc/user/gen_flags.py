#!/usr/bin/env python
"""Regenerate doc/user/script-flags.md from the CLI parsers.

Run from the repo root:  python doc/user/gen_flags.py

Every option in the generated page is read from the argparse parser the
script actually uses, so the documentation can never drift from the
supported surface (the reference maintains doc/user/scripts.rst by
hand; this is the self-updating equivalent).
"""
import contextlib
import importlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

SCRIPTS = {
    "abundance_dist": "abundance-dist.py",
    "abundance_dist_single": "abundance-dist-single.py",
    "annotate_partitions": "annotate-partitions.py",
    "count_median": "count-median.py",
    "do_partition": "do-partition.py",
    "extract_long_sequences": "extract-long-sequences.py",
    "extract_paired_reads": "extract-paired-reads.py",
    "extract_partitions": "extract-partitions.py",
    "fastq_to_fasta": "fastq-to-fasta.py",
    "filter_abund": "filter-abund.py",
    "filter_abund_single": "filter-abund-single.py",
    "filter_stoptags": "filter-stoptags.py",
    "find_knots": "find-knots.py",
    "interleave_reads": "interleave-reads.py",
    "load_graph": "load-graph.py",
    "load_into_counting": "load-into-counting.py",
    "make_initial_stoptags": "make-initial-stoptags.py",
    "merge_partitions": "merge-partitions.py",
    "normalize_by_median": "normalize-by-median.py",
    "partition_graph": "partition-graph.py",
    "readstats": "readstats.py",
    "sample_reads_randomly": "sample-reads-randomly.py",
    "split_paired_reads": "split-paired-reads.py",
    "trim_low_abund": "trim-low-abund.py",
    "unique_kmers": "unique-kmers.py",
}


def get_parser(mod):
    for name in ("get_parser", "build_parser", "_get_parser"):
        fn = getattr(mod, name, None)
        if fn:
            return fn()
    return None


def main():
    out = io.StringIO()
    out.write(
        "# Script flag reference\n\n"
        "Generated from the CLI parsers themselves "
        "(`python doc/user/gen_flags.py`),\nso every option below is "
        "the real, supported surface — identical names\nand semantics "
        "to the reference scripts (reference doc/user/scripts.rst),\n"
        "plus the khmer_tpu extensions (`--tpu-layout`, engine env "
        "vars).\nSee [scripts.md](scripts.md) for execution-tier "
        "notes.\n\n")
    n_ok = 0
    for mod_name, script in sorted(SCRIPTS.items(),
                                   key=lambda kv: kv[1]):
        mod = importlib.import_module("khmer_tpu.cli." + mod_name)
        p = get_parser(mod)
        if p is None:
            raise RuntimeError("no parser in %s" % mod_name)
        p.prog = script
        out.write("## %s\n\n" % script)
        desc = (p.description or "").strip().split("\n")[0]
        if desc:
            out.write("%s\n\n" % desc)
        with contextlib.redirect_stdout(io.StringIO()) as cap:
            p.print_usage()
        out.write("```\n%s\n```\n\n"
                  % cap.getvalue().strip().replace("usage: ", ""))
        out.write("| option | default | help |\n|---|---|---|\n")
        for a in p._actions:
            if a.help == "==SUPPRESS==":
                continue
            if a.option_strings:
                opts = ", ".join("`%s`" % o for o in a.option_strings)
            else:
                opts = "`%s`" % a.dest
            default = "" if a.default in (None, "==SUPPRESS==") \
                else repr(a.default)
            help_ = " ".join((a.help or "").replace("|", r"\|")
                             .split())
            help_ = help_.replace("%(default)s", str(a.default)) \
                         .replace("%(default)r", repr(a.default))
            out.write("| %s | %s | %s |\n" % (opts, default, help_))
        out.write("\n")
        n_ok += 1
    path = os.path.join(REPO, "doc", "user", "script-flags.md")
    with open(path, "w") as f:
        f.write(out.getvalue())
    print("wrote %s for %d scripts" % (path, n_ok))


if __name__ == "__main__":
    main()
