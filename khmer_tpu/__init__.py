"""khmer_tpu — a TPU-native k-mer counting and de Bruijn graph engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of khmer
(github.com/dib-lab/khmer): streaming k-mer counting into Bloom-filter
(Nodegraph) and Count-Min (Countgraph) sketches held in device HBM and
sharded by hash range across a TPU mesh, plus the algorithms built on top
(digital normalization, abundance trimming, HyperLogLog cardinality, and
tag-based de Bruijn graph partitioning).

Outputs are bit/record-compatible with khmer's OXLI v4 binary formats and
its reference CLI scripts.
"""

import os as _os

import jax

# The whole engine is built on native 64-bit hashes (HashIntoType=uint64 in
# the reference, include/oxli/oxli.hh:115). TPU + CPU backends support
# 64-bit integer ops under x64 mode.
jax.config.update("jax_enable_x64", True)

# Honor JAX_PLATFORMS=cpu even when a site plugin froze platform
# selection at interpreter startup (the tunneled-TPU environment does):
# without this, stray numpy->device transfers route to the remote
# accelerator and each one costs seconds.
if _os.environ.get("JAX_PLATFORMS", "").split(",")[0] == "cpu" \
        and (jax.config.jax_platforms or "") != "cpu":
    jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge as _xb

        _xb._clear_backends()
    except Exception:
        pass

# Persistent compile cache: this jax build does NOT honor the
# JAX_COMPILATION_CACHE_DIR environment variable (the config never
# picks it up under the site plugin), which silently disabled the
# cache and cost minutes of recompilation per process on the tunneled
# TPU. Route the env var — or a per-user default — through the config
# API, which does work. KHMER_TPU_NO_COMPILE_CACHE=1 opts out.
if not _os.environ.get("KHMER_TPU_NO_COMPILE_CACHE"):
    if not jax.config.jax_compilation_cache_dir:
        _cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache",
                          "khmer_tpu_jax"))
        try:
            _os.makedirs(_cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", _cache_dir)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                              -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
        except Exception:
            pass

__version__ = "0.1.0"

from khmer_tpu.core.sketch import (  # noqa: E402
    Countgraph,
    Counttable,
    CyclicCounttable,
    Nodegraph,
    Nodetable,
    QFCounttable,
    SmallCountgraph,
    SmallCounttable,
)
from khmer_tpu.core.blocked import (  # noqa: E402
    BlockedCountgraph,
    BlockedCounttable,
)
from khmer_tpu.core.hll import HLLCounter  # noqa: E402
from khmer_tpu.core.labels import GraphLabels  # noqa: E402
from khmer_tpu.core.aligner import ReadAligner  # noqa: E402
from khmer_tpu.core.assembly import (  # noqa: E402
    JunctionCountAssembler,
    LinearAssembler,
    SimpleLabeledAssembler,
)
from khmer_tpu.core.oxli_io import (  # noqa: E402
    extract_countgraph_info,
    extract_nodegraph_info,
    load_countgraph,
    load_nodegraph,
)
from khmer_tpu.ops.hashing import (  # noqa: E402
    forward_hash,
    forward_hash_no_rc,
    hash_murmur3,
    hash_no_rc_murmur3,
    reverse_complement,
    reverse_hash,
)
from khmer_tpu.core.sketch_kernels import (  # noqa: E402
    get_n_primes_near_x,
)
from khmer_tpu.io.fastx import ReadParser  # noqa: E402


# NOTE: no eager device-pinning here — the jax_platforms override
# above already removes any non-CPU client when CPU is requested, and
# touching jax.devices() at import would FREEZE the CPU device count
# before tests / dry runs can request a virtual multi-device world
# (see parallel.virtual_devices).

# Memory-per-bucket ratios per graph type (reference: khmer/__init__.py:86-92)
_buckets_per_byte = {
    # calculated by hand from settings in third-party/cqf/gqf.h
    "qfcounttable": 1 / 1.26,
    "countgraph": 1,
    "smallcountgraph": 2,
    "nodegraph": 8,
}


def calc_expected_collisions(graph, force=False, max_false_pos=0.2):
    """FP-rate guard mirroring reference khmer/__init__.py:181-215."""
    import math
    import sys

    sizes = graph.hashsizes()
    n_ht = float(len(sizes))
    occupancy = float(graph.n_occupied())
    min_size = min(sizes)

    fp_one = occupancy / float(min_size)
    fp_all = fp_one ** n_ht

    if fp_all > max_false_pos:
        print("**", file=sys.stderr)
        print(
            "** ERROR: the graph structure is too small for this data set."
            "Increase data structure size with --max_memory_usage/-M.",
            file=sys.stderr,
        )
        print("** Do not use these results!!", file=sys.stderr)
        print("**", file=sys.stderr)
        print("** (estimated false positive rate of %.3f;" % fp_all,
              file=sys.stderr, end=' ')
        print("max recommended %.3f)" % max_false_pos, file=sys.stderr)
        print("**", file=sys.stderr)

        if not force:
            sys.exit(1)

    return fp_all


__all__ = [
    "BlockedCountgraph",
    "BlockedCounttable",
    "Countgraph",
    "Counttable",
    "CyclicCounttable",
    "HLLCounter",
    "Nodegraph",
    "Nodetable",
    "QFCounttable",
    "SmallCountgraph",
    "SmallCounttable",
    "calc_expected_collisions",
    "extract_countgraph_info",
    "extract_nodegraph_info",
    "forward_hash",
    "forward_hash_no_rc",
    "hash_murmur3",
    "hash_no_rc_murmur3",
    "get_n_primes_near_x",
    "load_countgraph",
    "load_nodegraph",
    "reverse_complement",
    "reverse_hash",
]
