#!/usr/bin/env python
"""Normalized line-similarity of repo files vs their reference counterparts.

Strips comments, docstrings, and blank lines, then measures the fraction
of repo code lines that appear verbatim (whitespace-normalized) in the
reference counterpart. Used to validate the rewrite of files the round-2
review flagged as transcriptions (target: < 0.6).
"""
import ast
import io
import sys
import tokenize


def code_lines(path):
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        src = f.read()
    # Strip docstrings via AST, comments via tokenize.
    drop = set()
    try:
        tree = ast.parse(src)
        for node in ast.walk(tree):
            if isinstance(node, (ast.Module, ast.FunctionDef,
                                 ast.AsyncFunctionDef, ast.ClassDef)):
                body = getattr(node, "body", [])
                if body and isinstance(body[0], ast.Expr) and \
                        isinstance(body[0].value, ast.Constant) and \
                        isinstance(body[0].value.value, str):
                    for ln in range(body[0].lineno, body[0].end_lineno + 1):
                        drop.add(ln)
    except SyntaxError:
        pass
    out = []
    for i, line in enumerate(src.splitlines(), 1):
        if i in drop:
            continue
        line = line.split("#", 1)[0] if "#" in line and not (
            '"#"' in line or "'#'" in line) else line
        norm = "".join(line.split())
        if norm:
            out.append(norm)
    return out


def similarity(repo_path, ref_path):
    a = code_lines(repo_path)
    b = set(code_lines(ref_path))
    if not a:
        return 0.0
    hits = sum(1 for line in a if line in b)
    return hits / len(a)


PAIRS = [
    ("sandbox/make-coverage.py", "sandbox/make-coverage.py"),
    ("sandbox/calc-best-assembly.py", "sandbox/calc-best-assembly.py"),
    ("sandbox/collect-reads.py", "sandbox/collect-reads.py"),
    ("sandbox/renumber-partitions.py", "sandbox/renumber-partitions.py"),
    ("sandbox/saturate-by-median.py", "sandbox/saturate-by-median.py"),
    ("sandbox/write-trimmomatic.py", "sandbox/write-trimmomatic.py"),
    ("sandbox/stoptags-by-position.py", "sandbox/stoptags-by-position.py"),
    ("sandbox/split-sequences-by-length.py",
     "sandbox/split-sequences-by-length.py"),
    ("khmer_tpu/cli/sample_reads_randomly.py",
     "scripts/sample-reads-randomly.py"),
    ("khmer_tpu/cli/make_initial_stoptags.py",
     "scripts/make-initial-stoptags.py"),
    # round-5 rewrites (the round-4 verdict's third transcription band)
    ("sandbox/calc-error-profile.py", "sandbox/calc-error-profile.py"),
    ("sandbox/print-tagset.py", "sandbox/print-tagset.py"),
    ("sandbox/split-fasta.py", "sandbox/split-fasta.py"),
    ("sandbox/print-stoptags.py", "sandbox/print-stoptags.py"),
    ("sandbox/filter-below-abund.py", "sandbox/filter-below-abund.py"),
    ("sandbox/subset-report.py", "sandbox/subset-report.py"),
    ("sandbox/sweep-out-reads-with-contigs.py",
     "sandbox/sweep-out-reads-with-contigs.py"),
    ("sandbox/filter-median.py", "sandbox/filter-median.py"),
    ("sandbox/extract-single-partition.py",
     "sandbox/extract-single-partition.py"),
]

if __name__ == "__main__":
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ref = "/root/reference"
    worst = 0.0
    for rp, fp in PAIRS:
        s = similarity(os.path.join(repo, rp), os.path.join(ref, fp))
        flag = "  <-- STILL HIGH" if s >= 0.6 else ""
        print("%.2f  %s%s" % (s, rp, flag))
        worst = max(worst, s)
    sys.exit(1 if worst >= 0.6 else 0)
