"""De Bruijn graph semantics over the reversible 2-bit hash.

The graph is implicit (reference: include/oxli/hashgraph.hh): a node is a
canonical k-mer present in the sketch; edges are probed by constructing
the 4 left / 4 right neighbors via 2-bit shifts and testing membership.
Neighbor probes run batched on device; traversal frontiers are
orchestrated host-side with numpy.

Key semantics mirrored:
- tagging every _tag_density-th k-mer while consuming
  (Hashgraph::consume_sequence_and_tag, src/oxli/hashgraph.cc:200-271)
- neighbor bit-ops (hashgraph.hh:67-71)
- BFS traversal caps (MAX_KEEPER_SIZE etc., hashgraph.hh:65)
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from khmer_tpu.core import sketch_kernels as K
from khmer_tpu.ops import hashing as H

DEFAULT_TAG_DENSITY = 40   # reference: include/oxli/oxli.hh:83
MAX_KEEPER_SIZE = int(1e6)  # reference: include/oxli/hashgraph.hh:65


@functools.lru_cache(maxsize=None)
def make_neighbors_fn(kind, primes, k):
    """Batch 8-neighbor probe.

    fn(tables, f[N], r[N]) ->
       (nf [N,8], nr [N,8], ncanon [N,8], present [N,8])
    Neighbors 0-3 extend right with base b, 4-7 extend left with base b.
    """
    primes = tuple(int(p) for p in primes)
    bitmask = (1 << (2 * k)) - 1
    shift = 2 * k - 2

    @jax.jit
    def fn(tables, f, r):
        f = f[:, None]
        r = r[:, None]
        b = jnp.arange(4, dtype=jnp.uint64)[None, :]
        comp_b = b ^ np.uint64(1)
        # right neighbors (hashgraph.hh next_f/next_r)
        rf = ((f << np.uint64(2)) | b) & np.uint64(bitmask)
        rr = (r >> np.uint64(2)) | (comp_b << np.uint64(shift))
        # left neighbors (prev_f/prev_r)
        lf = (f >> np.uint64(2)) | (b << np.uint64(shift))
        lr = ((r << np.uint64(2)) | comp_b) & np.uint64(bitmask)
        nf = jnp.concatenate([rf, lf], axis=1)
        nr = jnp.concatenate([rr, lr], axis=1)
        ncanon = jnp.minimum(nf, nr)
        present = K._gather_counts(kind, primes, tables, ncanon) > 0
        return nf, nr, ncanon, present

    return fn


class HashgraphMixin:
    """Graph operations mixed into Countgraph / SmallCountgraph /
    Nodegraph."""

    def _init_graph(self):
        self.all_tags = set()
        self.stop_tags = set()
        self._tag_density = DEFAULT_TAG_DENSITY
        self._partition = None

    @property
    def partition(self):
        """The graph's own SubsetPartition (reference Hashgraph keeps
        one for merge/annotate operations)."""
        if self._partition is None:
            from khmer_tpu.core.partition import SubsetPartition

            self._partition = SubsetPartition(self)
        return self._partition

    def merge_subset(self, subset):
        self.partition.merge(subset)

    def merge_subset_from_disk(self, filename):
        self.partition.merge_from_disk(filename)

    def output_partitions(self, infile, outfile,
                          output_unassigned=False):
        return self.partition.output_partitioned_file(
            infile, outfile, output_unassigned)

    def load_partitionmap(self, filename):
        self.partition.load_partitionmap(filename)

    def save_partitionmap(self, filename):
        self.partition.save_partitionmap(filename)

    def count_partitions(self):
        return self.partition.count_partitions()

    def assign_partition_id(self, kmer, tagged_kmers):
        return self.partition.assign_partition_id(kmer, tagged_kmers)

    # -- tag density / sets ----------------------------------------------

    def _get_tag_density(self):
        return self._tag_density

    def _set_tag_density(self, d):
        if d % 2 != 0:
            raise ValueError("tag density must be even")
        self._tag_density = d

    def n_tags(self):
        return len(self.all_tags)

    def add_tag(self, kmer):
        self.all_tags.add(self._tag_hash(kmer))

    def get_tagset(self):
        return [self.reverse_hash(t) for t in sorted(self.all_tags)]

    def _tag_hash(self, kmer):
        if isinstance(kmer, str):
            return self.hash(kmer)
        return int(kmer)

    def add_stop_tag(self, kmer):
        self.stop_tags.add(self._tag_hash(kmer))

    def n_stop_tags(self):
        return len(self.stop_tags)

    def get_stop_tags(self):
        return [self.reverse_hash(t) for t in sorted(self.stop_tags)]

    def divide_tags_into_subsets(self, subset_size):
        """Every subset_size-th tag, in sorted order.

        reference: Hashgraph::divide_tags_into_subsets
        (src/oxli/hashgraph.cc:349-362).
        """
        divvy = []
        i = 0
        for tag in sorted(self.all_tags):
            if i % subset_size == 0:
                divvy.append(tag)
            i += 1
        return divvy

    # -- tagging consume ---------------------------------------------------

    def consume_and_tag(self, seq):
        """Count + tag one sequence; returns n new k-mers consumed.

        reference: Hashgraph::consume_sequence_and_tag
        (src/oxli/hashgraph.cc:200-271).
        """
        n, _ = self._consume_and_tag_seq(seq)
        return n

    def _event_new_for_hashes(self, hashes):
        """Commit hashes to the sketch; return per-event is-new flags
        (exact test_and_set_bits semantics)."""
        M0 = hashes.shape[0]
        M = max(((M0 + 255) // 256) * 256, 256)
        hb = np.zeros(M, dtype=np.uint64)
        hb[:M0] = hashes
        vb = np.zeros(M, dtype=bool)
        vb[:M0] = True
        self.tables, out = self._update_fn(with_event_new=True)(
            self.tables, self._n_unique, jnp.asarray(hb), jnp.asarray(vb))
        self._n_unique = out["n_unique"]
        if self._use_bigcount and ("sat_total" in out
                                   or "satev_total" in out):
            self._absorb_saturation(out)
        return np.asarray(out["event_new"])[:M0]

    def _consume_and_tag_seq(self, seq, found_tags=None):
        hashes = self._hashes_for_sequence(seq)
        if hashes.size == 0:
            return 0, found_tags
        is_new = self._event_new_for_hashes(hashes)
        n_consumed = self._tag_spacing_pass(hashes, is_new, found_tags)
        return n_consumed, found_tags

    def sweep_tag_neighborhood(self, seq, range=0,
                               break_on_stop_tags=False,
                               stop_big_traversals=False):
        """Tags within `range` of the sequence perimeter
        (SubsetPartition::sweep_for_tags, subset.cc:305-394)."""
        from khmer_tpu.core.partition import sweep_for_tags

        return sweep_for_tags(self, seq, range, break_on_stop_tags,
                              stop_big_traversals)[0]

    def _tag_spacing_pass(self, hashes, is_new, found_tags=None):
        """Host pass applying the tag-spacing rules for one read."""
        since = self._tag_density // 2 + 1
        n_consumed, since, kmer = self._tag_spacing_step(
            hashes, is_new, since, found_tags)
        self._tag_spacing_tail(since, kmer, found_tags)
        return n_consumed

    def _tag_spacing_step(self, hashes, is_new, since, found_tags=None):
        """Incremental spacing pass over one segment of a read."""
        density = self._tag_density
        n_consumed = 0
        all_tags = self.all_tags
        kmer = None
        for i in range(hashes.shape[0]):
            kmer = int(hashes[i])
            if is_new[i]:
                n_consumed += 1
                since += 1
            elif kmer in all_tags:
                since = 1
                if found_tags is not None:
                    found_tags.add(kmer)
            else:
                since += 1
            if since >= density:
                all_tags.add(kmer)
                if found_tags is not None:
                    found_tags.add(kmer)
                since = 1
        return n_consumed, since, kmer

    def _tag_spacing_tail(self, since, kmer, found_tags=None):
        """End-of-read rule: tag the last k-mer if spacing warrants."""
        if since >= self._tag_density // 2 - 1 and kmer is not None:
            self.all_tags.add(kmer)
            if found_tags is not None:
                found_tags.add(kmer)

    def consume_seqfile_and_tag(self, source):
        """Returns (total_reads, n_consumed).

        reference: Hashgraph::consume_seqfile_and_tag
        (src/oxli/hashgraph.cc:279-320). The tag-spacing state machine
        is inherently sequential, so the native host engine runs the
        whole pass (hash + exact test_and_set + spacing) in one C++
        stream when available; the device path below is the JAX
        reference implementation (and the fallback).
        """
        from khmer_tpu.core import hostengine, pipeline

        if hostengine.use_host_for(self, "graph"):
            return hostengine.consume_seqfile_and_tag(self, source)

        k = self._ksize
        chunk = pipeline.consume_chunk_size(self.storage_kind,
                                            self._primes)
        step = pipeline.make_flat_consume(
            self.storage_kind, self._primes, k, self.hash_family,
            with_event_new=True,
            with_bigcount=(self._use_bigcount
                           and self.storage_kind == "byte"),
            chunk=chunk)
        packer = pipeline.FlatPacker(k, track_segments=True, chunk=chunk)
        total_reads = 0
        n_consumed_tags = 0  # new k-mers, counted on host for exactness
        n_consumed = jnp.zeros((), jnp.uint64)
        overflow = jnp.zeros((), bool)
        # spacing state carried across split-read segments
        carry = [self._tag_density // 2 + 1, None, False]

        def commit(chunks):
            nonlocal n_consumed, n_consumed_tags, overflow
            for codes, starts, nfill, segments in chunks:
                tables, n_unique, n_consumed, overflow, out = step(
                    self.tables, self._n_unique, n_consumed, overflow,
                    jnp.asarray(codes), jnp.asarray(starts),
                    jnp.int32(nfill))
                self.tables = tables
                self._n_unique = n_unique
                if ("sat_total" in out or "satev_total" in out):
                    self._absorb_saturation(out)
                is_new = np.asarray(out["event_new"])
                hs = np.asarray(out["hashes"])
                for off, n_win, is_cont in segments:
                    if not is_cont:
                        # finish previous read first
                        if carry[2]:
                            self._tag_spacing_tail(carry[0], carry[1])
                        carry[0] = self._tag_density // 2 + 1
                        carry[1] = None
                    nc, since, kmer = self._tag_spacing_step(
                        hs[off:off + n_win], is_new[off:off + n_win],
                        carry[0])
                    n_consumed_tags += nc
                    carry[0] = since
                    carry[1] = kmer
                    carry[2] = True

        for record in pipeline.records_from(source):
            seq = record.cleaned_seq
            total_reads += 1
            if len(seq) < k:
                continue
            commit(packer.add(seq))
        tail = packer.flush()
        if tail is not None:
            commit([tail])
        if carry[2]:
            self._tag_spacing_tail(carry[0], carry[1])
        K.check_v2_overflow(overflow)
        return total_reads, n_consumed_tags

    def get_tags_for_sequence(self, seq):
        """Tags present among the sequence's k-mers
        (hashgraph.cc:324-342)."""
        hashes = self._hashes_for_sequence(seq)
        return [int(h) for h in hashes if int(h) in self.all_tags]

    def get_tags_and_positions(self, seq):
        hashes = self._hashes_for_sequence(seq)
        return [(i + self._ksize, int(h)) for i, h in enumerate(hashes)
                if int(h) in self.all_tags]

    def find_all_tags_list(self, kmer):
        from khmer_tpu.core import partition as P

        _, f, r = H._hash_scalar(kmer, self._ksize)
        tags = P.find_all_tags(self, f, r)
        return [int(t) for t in tags]

    # -- tagset / stoptags persistence ------------------------------------

    def save_tagset(self, path):
        from khmer_tpu.core import oxli_io

        oxli_io.save_tagset(path, self._ksize, self.all_tags,
                            self._tag_density)

    def load_tagset(self, path, clear_tags=True):
        from khmer_tpu.core import oxli_io

        tags, density = oxli_io.load_tagset(path, self._ksize)
        if clear_tags:
            self.all_tags = tags
        else:
            self.all_tags |= tags
        self._tag_density = density

    def save_stop_tags(self, path):
        from khmer_tpu.core import oxli_io

        oxli_io.save_stoptags(path, self._ksize, self.stop_tags)

    def load_stop_tags(self, path, clear_tags=True):
        from khmer_tpu.core import oxli_io

        st = oxli_io.load_stoptags(path, self._ksize)
        if clear_tags:
            self.stop_tags = st
        else:
            self.stop_tags |= st

    def print_tagset(self, path):
        with open(path, "w") as f:
            for t in sorted(self.all_tags):
                f.write(self.reverse_hash(t) + "\n")

    def print_stop_tags(self, path):
        with open(path, "w") as f:
            for t in sorted(self.stop_tags):
                f.write(self.reverse_hash(t) + "\n")

    # -- neighbors / degree -----------------------------------------------

    def _neighbors_fn(self):
        return make_neighbors_fn(self.storage_kind, self._primes,
                                 self._ksize)

    def neighbors_batch(self, f_arr, r_arr):
        """(nf, nr, ncanon, present) for arrays of (f, r) k-mers."""
        fn = self._neighbors_fn()
        return fn(self.tables,
                  jnp.asarray(f_arr, dtype=jnp.uint64),
                  jnp.asarray(r_arr, dtype=jnp.uint64))

    def neighbors(self, kmer):
        """Present neighbor canonical hashes of one k-mer (str or hash)."""
        f, r = self._fr_for(kmer)
        nf, nr, nc, present = self.neighbors_batch(
            np.array([f], np.uint64), np.array([r], np.uint64))
        present = np.asarray(present)[0]
        nc = np.asarray(nc)[0]
        return [int(nc[i]) for i in range(8) if present[i]]

    def _fr_for(self, kmer):
        if isinstance(kmer, str):
            if len(kmer) != self._ksize:
                raise ValueError(
                    "Expected k-mer length %d but got %d."
                    % (self._ksize, len(kmer)))
            _, f, r = H._hash_scalar(kmer, self._ksize)
            return f, r
        # hash given: reconstruct the sequence (reversible hash)
        s = H.reverse_hash(int(kmer), self._ksize)
        _, f, r = H._hash_scalar(s, self._ksize)
        return f, r

    def kmer_degree(self, kmer_f, kmer_r=None):
        """Number of present neighbors (hashgraph.cc:473-485)."""
        if isinstance(kmer_f, str) and kmer_r is None:
            f, r = self._fr_for(kmer_f)
        elif isinstance(kmer_f, str):
            _, f, _ = H._hash_scalar(kmer_f, self._ksize)
            _, r0, _ = H._hash_scalar(kmer_r, self._ksize)
            r = r0
        else:
            f, r = int(kmer_f), int(kmer_r)
        _, _, _, present = self.neighbors_batch(
            np.array([f], np.uint64), np.array([r], np.uint64))
        return int(np.asarray(present)[0].sum())

    # -- traversal ---------------------------------------------------------

    def calc_connected_graph_size(self, kmer, max_size=0,
                                  break_on_circumference=False):
        """BFS size of the component containing kmer
        (hashgraph.cc:420-471)."""
        from khmer_tpu.core import traversal as T

        return T.calc_connected_graph_size(self, kmer, max_size)

    def traverse_linear_path(self, kmer, adjacencies=None, visited=None,
                             stop_filter=None):
        from khmer_tpu.core import traversal as T

        return T.traverse_linear_path(self, kmer, adjacencies, visited,
                                      stop_filter)

    def find_high_degree_nodes(self, seq):
        """Set of k-mers in seq with degree > 2 (hashgraph.cc:820-841)."""
        hashes = self._hashes_for_sequence(seq)
        if hashes.size == 0:
            return set()
        codes = H.encode_dna(seq)
        n = len(hashes)
        fs = np.zeros(n, np.uint64)
        rs = np.zeros(n, np.uint64)
        for i in range(n):
            sub = H.decode_dna(codes[i:i + self._ksize])
            _, fs[i], rs[i] = H._hash_scalar(sub, self._ksize)
        _, _, _, present = self.neighbors_batch(fs, rs)
        deg = np.asarray(present).sum(axis=1)
        return set(int(h) for h, d in zip(hashes, deg) if d > 2)

    def extract_unique_paths(self, seq, min_length, min_unique_f):
        """Extract maximal windows whose k-mers are mostly unseen
        (reference hashgraph.cc:723-817, same quirky endpoint
        adjustments)."""
        if len(seq) < min_length:
            return []
        max_seen = 1.0 - min_unique_f
        min_length = min_length - self._ksize + 1
        counts = self.get_counts_for_hashes(
            self._hashes_for_sequence(seq))
        seen = [bool(c) for c in counts]
        n_kmers = len(seen)
        results = []
        i = 0
        while i < n_kmers - min_length:
            seen_counter = sum(1 for j in range(min_length)
                               if seen[i + j])
            if (seen_counter / float(min_length)) <= max_seen:
                start = i
                while (start + min_length) < n_kmers:
                    if seen[start]:
                        seen_counter -= 1
                    if seen[start + min_length]:
                        seen_counter += 1
                    start += 1
                    if (seen_counter / float(min_length)) > max_seen:
                        break
                if start + min_length == n_kmers:
                    if (seen_counter / float(min_length)) > max_seen:
                        start -= 1
                    start -= 1
                else:
                    start -= 2
                results.append(
                    seq[i: start + min_length + self._ksize])
                i = start + min_length + 1
            else:
                i += 1
        return results

    def trim_on_stoptags(self, seq):
        """Trim at the first stoptag k-mer (hashgraph.cc:487-501):
        position k-2+i for a stoptag at window i."""
        hashes = self._hashes_for_sequence(seq)
        for i, h in enumerate(hashes):
            if int(h) in self.stop_tags:
                pos = self._ksize - 2 + i
                return seq[:pos], pos
        return seq, len(seq)

    def repartition_largest_partition(self, counts, distance, threshold,
                                      frequency, subs=None):
        """Find HCKs in the largest partition -> stop tags
        (reference graphs.pyx:755, subset.cc:1218)."""
        target = subs if subs is not None else self.partition
        return target.repartition_largest_partition(
            distance, threshold, frequency, counts)

    def assemble_linear_path(self, seed_kmer, stop_bf=None):
        """Assemble the maximal linear path through seed_kmer
        (reference graphs.pyx Hashgraph.assemble_linear_path)."""
        from khmer_tpu.core.assembly import LinearAssembler

        return LinearAssembler(self).assemble(seed_kmer, stop_bf)

    # -- partitioning entry points (delegated) -----------------------------

    def do_subset_partition(self, start_kmer=0, end_kmer=0,
                            break_on_stoptags=False,
                            stop_big_traversals=False):
        from khmer_tpu.core.partition import SubsetPartition

        subset = SubsetPartition(self)
        subset.do_partition(start_kmer, end_kmer, break_on_stoptags,
                            stop_big_traversals)
        return subset

    def do_subset_partition_with_abundance(self, min_count, max_count,
                                           start_kmer=0, end_kmer=0,
                                           break_on_stop_tags=False,
                                           stop_big_traversals=False):
        """Partition only through k-mers whose count lies in
        [min_count, max_count] (reference graphs.pyx:833-855,
        subset.cc:557-613) — streaming/abundance-banded partitioning."""
        from khmer_tpu.core.partition import SubsetPartition

        subset = SubsetPartition(self)
        subset.do_partition_with_abundance(
            start_kmer, end_kmer, min_count, max_count,
            break_on_stop_tags, stop_big_traversals)
        return subset

    def consume_seqfile_and_tag_with_reads_parser(self, parser):
        return self.consume_seqfile_and_tag(parser)

    def consume_partitioned_fasta(self, filename):
        from khmer_tpu.core.partition import consume_partitioned_fasta

        total_reads, n_consumed, subset = consume_partitioned_fasta(
            self, filename)
        self._partition = subset
        return total_reads, n_consumed
