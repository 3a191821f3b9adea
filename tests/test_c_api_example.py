"""The examples/c-api program builds and runs against the host-tier
extern-C surface (src/khmer_tpu_host.h) — keeps the documented C API
honest (reference ships examples/c++-api/*.cc the same way)."""

import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXDIR = os.path.join(REPO, "examples", "c-api")


@pytest.mark.skipif(shutil.which("make") is None or
                    shutil.which("cc") is None,
                    reason="C toolchain unavailable")
def test_c_api_examples_run():
    build = subprocess.run(["make", "-s"], cwd=EXDIR,
                           capture_output=True, text=True, timeout=240)
    assert build.returncode == 0, build.stderr[-1000:]

    run = subprocess.run([os.path.join(EXDIR, "exact-counting")],
                         cwd=EXDIR, capture_output=True, text=True,
                         timeout=60)
    assert run.returncode == 0, run.stdout + run.stderr
    assert "consumed 90 k-mers from 3 reads; 50 distinct" in run.stdout
    assert run.stdout.strip().endswith("OK")

    run = subprocess.run([os.path.join(EXDIR, "bloom")], cwd=EXDIR,
                         capture_output=True, text=True, timeout=60)
    assert run.returncode == 0, run.stdout + run.stderr
    assert run.stdout.strip().endswith("OK")

    run = subprocess.run([os.path.join(EXDIR, "consume"),
                          "reads.fastq"], cwd=EXDIR,
                         capture_output=True, text=True, timeout=60)
    assert run.returncode == 0, run.stdout + run.stderr
    assert "200 reads, 12200 k-mers, 2440 distinct" in run.stdout
