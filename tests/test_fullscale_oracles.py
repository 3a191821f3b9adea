"""Full-scale byte-exact CLI output oracles (BASELINE configs 2 and 3).

The reference bytes were produced by the UNMODIFIED reference liboxli
driven through tests/golden/refbench.cc's `trimout` / `normout` modes,
which mirror the scripts' record contracts line for line
(reference scripts/trim-low-abund.py:162-300 + khmer/trimming.py:38-66;
scripts/normalize-by-median.py:155-180 + khmer/utils.py:120-135).

Regenerate the goldens with:
    bash tests/golden/refbuild.sh        # builds /tmp/refbuild/refbench
    /tmp/refbuild/refbench trimout data/25k.fq.gz /tmp/ref.abundtrim
    /tmp/refbuild/refbench normout data/stamps-reads.fa.gz 20 /tmp/ref.keep

These are the flagship "a khmer user can switch and get the same
bytes" guarantees at real scale: 25,000 FASTQ reads through the
two-pass trimmer, 200,000 FASTA reads through diginorm.
"""

import hashlib
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# md5 of refbench trimout on data/25k.fq.gz (-C 2 -Z 20, 4 x 2.5e7),
# 60 records — verified 2026-08-21 against a fresh liboxli build
ABUNDTRIM_MD5 = "4be532b1eb5d3e131f4f0ee8ff209e74"
# md5 of refbench normout on data/stamps-reads.fa.gz (C=20, 4 x 1e8),
# 7,416 records — verified 2026-08-21 against a fresh liboxli build
KEEP_MD5 = "6d72bb9efd8fea45fd60917739a20428"


def _run_cli(module, args, cwd):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "-m", module] + args,
        cwd=str(cwd), env=env, capture_output=True, text=True,
        timeout=560)
    assert res.returncode == 0, res.stderr[-2000:]
    return res


def _md5(path):
    h = hashlib.md5()
    with open(path, "rb") as f:
        for blk in iter(lambda: f.read(1 << 20), b""):
            h.update(blk)
    return h.hexdigest()


def test_trim_low_abund_fullscale_md5(tmp_path):
    """Config 3 at full scale: 25k reads, .abundtrim byte-exact."""
    _run_cli("khmer_tpu.cli.trim_low_abund",
             ["-C", "2", "-Z", "20", "-x", "2.5e7", "-N", "4", "-k",
              "20", os.path.join(REPO, "data", "25k.fq.gz")], tmp_path)
    out = tmp_path / "25k.fq.gz.abundtrim"
    assert out.exists()
    assert _md5(out) == ABUNDTRIM_MD5


def test_normalize_fullscale_md5(tmp_path):
    """Config 2 at full scale: 200k reads, .keep byte-exact."""
    _run_cli("khmer_tpu.cli.normalize_by_median",
             ["-C", "20", "-k", "20", "-x", "1e8", "-N", "4",
              os.path.join(REPO, "data", "stamps-reads.fa.gz")],
             tmp_path)
    out = tmp_path / "stamps-reads.fa.gz.keep"
    assert out.exists()
    assert _md5(out) == KEEP_MD5
