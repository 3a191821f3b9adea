"""Tag <-> label multimaps over a Hashgraph (reference: LabelHash,
src/oxli/labelhash.cc, khmer/_oxli/labeling.pyx).

Labels attach metadata (usually the read ordinal) to graph tags,
enabling label-aware sweeps and labeled assembly across high-degree
nodes. Consuming runs through the batched pipeline (exact per-event
new-k-mer flags); the labeled tag-spacing pass runs on host.
"""

import struct

import numpy as np

from khmer_tpu.ops import hashing as H


class GraphLabels:
    """khmer-compatible GraphLabels / LabelHash."""

    def __init__(self, graph):
        self.graph = graph
        self.tag_labels = {}   # tag -> set of labels (multimap)
        self.label_tag = {}    # label -> set of tags
        self.all_labels = set()

    @property
    def _default_sweep_radius(self):
        return (2 * self.graph._tag_density) + 1

    @property
    def n_labels(self):
        return len(self.all_labels)

    def labels(self):
        return sorted(self.all_labels)

    def link_tag_and_label(self, tag, label):
        """reference labelhash.cc:206-214."""
        self.tag_labels.setdefault(tag, set()).add(label)
        self.label_tag.setdefault(label, set()).add(tag)
        self.all_labels.add(label)

    def get_tag_labels(self, tag):
        tag = int(tag) if not isinstance(tag, str) else \
            self.graph.hash(tag)
        if tag in self.graph.all_tags:
            return sorted(self.tag_labels.get(tag, ()))
        return []

    # -- consuming --------------------------------------------------------

    def consume_seqfile_and_tag_with_labels(self, source):
        """Label = read ordinal (reference labelhash.cc:84-144).

        Returns (total_reads, n_consumed).  The tag-spacing pass runs
        on the native host tier per read when available (one C call
        per read with a persistent tag set, found tags linked to the
        read's label here) — the device path commits once per read and
        pays a dispatch round trip each time.
        """
        from khmer_tpu.core import hostengine, pipeline

        graph = self.graph
        k = graph.ksize()
        total_reads = 0
        n_consumed = 0
        native = None
        if hostengine.use_host_for(graph, "graph"):
            native = hostengine.LabeledTagConsumer(graph)
        try:
            for record in pipeline.records_from(source):
                seq = record.cleaned_seq
                label = total_reads
                total_reads += 1
                if len(seq) < k:
                    continue
                if native is not None:
                    nc, found = native.consume_read(seq)
                    n_consumed += nc
                    for tag in found:
                        self.link_tag_and_label(int(tag), label)
                else:
                    n_consumed += \
                        self._consume_sequence_and_tag_with_labels(
                            seq, label)
        finally:
            if native is not None:
                native.finish()
        return total_reads, n_consumed

    def _consume_sequence_and_tag_with_labels(self, seq, label,
                                              found_tags=None):
        """reference labelhash.cc:216-307: the tag-spacing pass with
        label linking at tag encounters and tag drops."""
        graph = self.graph
        hashes = graph._hashes_for_sequence(seq)
        if hashes.size == 0:
            return 0
        is_new = graph._event_new_for_hashes(hashes)
        density = graph._tag_density
        since = density // 2 + 1
        n_consumed = 0
        all_tags = graph.all_tags
        kmer = None
        for i in range(hashes.shape[0]):
            kmer = int(hashes[i])
            if is_new[i]:
                n_consumed += 1
                since += 1
            elif kmer in all_tags:
                since = 1
                if label not in self.tag_labels.get(kmer, ()):
                    self.link_tag_and_label(kmer, label)
                if found_tags is not None:
                    found_tags.add(kmer)
            else:
                since += 1
            if since >= density:
                all_tags.add(kmer)
                self.link_tag_and_label(kmer, label)
                if found_tags is not None:
                    found_tags.add(kmer)
                since = 1
        if since >= density // 2 - 1 and kmer is not None:
            all_tags.add(kmer)
            self.link_tag_and_label(kmer, label)
            if found_tags is not None:
                found_tags.add(kmer)
        return n_consumed

    def consume_partitioned_fasta_and_tag_with_labels(self, filename):
        """Label = partition id from the '\\tN' name annotation
        (reference labelhash.cc:147-199)."""
        from khmer_tpu.core import pipeline
        from khmer_tpu.core.partition import _atoi_prefix

        from khmer_tpu.core import hostengine

        graph = self.graph
        k = graph.ksize()
        total_reads = 0
        n_consumed = 0
        native = None
        if hostengine.use_host_for(graph, "graph"):
            native = hostengine.LabeledTagConsumer(graph)
        try:
            for record in pipeline.records_from(filename):
                seq = record.cleaned_seq
                name = record.name
                # same mandatory-'\t' parse as consume_partitioned_fasta
                # (reference read_parsers.hh:210-233 _parse_partition_id
                # throws without the tab; atoi -> 0 on a bad suffix)
                parts = name.rsplit("\t", 1)
                if len(parts) != 2:
                    raise ValueError(
                        "consume_partitioned_fasta_and_tag_with_labels "
                        "cannot find partition ID for read " + name)
                label = _atoi_prefix(parts[1])
                total_reads += 1
                if len(seq) < k:
                    continue
                if native is not None:
                    nc, found = native.consume_read(seq)
                    n_consumed += nc
                    for tag in found:
                        self.link_tag_and_label(int(tag), label)
                else:
                    n_consumed += \
                        self._consume_sequence_and_tag_with_labels(
                            seq, label)
        finally:
            if native is not None:
                native.finish()
        return total_reads, n_consumed

    # -- sweeps -----------------------------------------------------------

    def sweep_label_neighborhood(self, sequence, range=0,
                                 break_on_stop_tags=False,
                                 stop_big_traversals=False):
        """Labels of tags within `range` of the sequence
        (labelhash.cc:309-330); returns the label list.

        range=0 sweeps only the sequence's own k-mers; only
        range=None substitutes the default (2*tag_density)+1 radius
        (reference labeling.pyx:29-37).
        """
        if range is None:
            range = self._default_sweep_radius
        tagged = self.graph.sweep_tag_neighborhood(
            sequence, range, break_on_stop_tags, stop_big_traversals)
        found = set()
        for tag in tagged:
            for lab in self.tag_labels.get(tag, ()):
                found.add(lab)
        return sorted(found)

    def get_labels_for_sequence(self, seq):
        """Labels attached to tags present in the sequence
        (labelhash.cc:342-372)."""
        found = set()
        for h in self.graph._hashes_for_sequence(seq):
            h = int(h)
            if h in self.graph.all_tags:
                for lab in self.tag_labels.get(h, ()):
                    found.add(lab)
        return sorted(found)

    def label_across_high_degree_nodes(self, sequence,
                                       high_degree_nodes, label):
        """Tag + label the k-mers around HDNs (labelhash.cc:604-641)."""
        graph = self.graph
        hashes = [int(h) for h in graph._hashes_for_sequence(sequence)]
        if len(hashes) < 3:
            return
        hdns = set(int(h) for h in high_degree_nodes)
        for i in range(1, len(hashes) - 1):
            kmer = hashes[i]
            if kmer in hdns:
                prev_kmer = hashes[i - 1]
                next_kmer = hashes[i + 1]
                graph.all_tags.add(prev_kmer)
                graph.all_tags.add(kmer)
                graph.all_tags.add(next_kmer)
                self.link_tag_and_label(prev_kmer, label)
                self.link_tag_and_label(kmer, label)
                self.link_tag_and_label(next_kmer, label)

    # -- assembly (labeled) -----------------------------------------------

    def assemble_labeled_path(self, seed_kmer):
        from khmer_tpu.core.assembly import SimpleLabeledAssembler

        return SimpleLabeledAssembler(self).assemble(seed_kmer)

    # -- persistence ------------------------------------------------------

    def save_labels_and_tags(self, filename):
        """OXLI type SAVED_LABELSET: ksize u32, n pairs u64, then
        (tag u64, label u64)* (reference labelhash.cc:400-450)."""
        from khmer_tpu.core.oxli_io import (SAVED_FORMAT_VERSION,
                                            SAVED_LABELSET,
                                            SAVED_SIGNATURE)

        pairs = []
        for tag in sorted(self.tag_labels):
            for lab in sorted(self.tag_labels[tag]):
                pairs.append((tag, lab))
        with open(filename, "wb") as f:
            f.write(SAVED_SIGNATURE)
            f.write(bytes([SAVED_FORMAT_VERSION, SAVED_LABELSET]))
            f.write(struct.pack("<IQ", self.graph.ksize(), len(pairs)))
            for tag, lab in pairs:
                f.write(struct.pack("<QQ", tag, lab))

    def load_labels_and_tags(self, filename):
        from khmer_tpu.core.oxli_io import (SAVED_FORMAT_VERSION,
                                            SAVED_LABELSET,
                                            SAVED_SIGNATURE, _open_read)

        with _open_read(filename) as f:
            sig = f.read(4)
            if sig != SAVED_SIGNATURE:
                raise OSError("Incorrect file signature while reading "
                              "labels/tags from %s" % filename)
            version = f.read(1)[0]
            if version != SAVED_FORMAT_VERSION:
                raise OSError("Incorrect file format version %d while "
                              "reading labels/tags from %s"
                              % (version, filename))
            ht_type = f.read(1)[0]
            if ht_type != SAVED_LABELSET:
                raise OSError("Incorrect file format type %d while "
                              "reading labels/tags from %s"
                              % (ht_type, filename))
            (ksize,) = struct.unpack("<I", f.read(4))
            if ksize != self.graph.ksize():
                raise OSError("Incorrect k-mer size %d while reading "
                              "labels/tags from %s" % (ksize, filename))
            (n,) = struct.unpack("<Q", f.read(8))
            for _ in range(n):
                tag, lab = struct.unpack("<QQ", f.read(16))
                self.graph.all_tags.add(tag)
                self.link_tag_and_label(tag, lab)
