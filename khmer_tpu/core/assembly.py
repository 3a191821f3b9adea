"""Contig assembly over the implicit de Bruijn graph
(reference: src/oxli/assembler.cc, src/oxli/traversal.cc,
khmer/_oxli/assembly.pyx).

- LinearAssembler: extend left+right from a seed until a branch or a
  stop filter fires (AssemblerTraverser::next_symbol semantics).
- SimpleLabeledAssembler: hops high-degree nodes when a label spans
  them (label-intersect filter).
- JunctionCountAssembler: counts junction crossings in a side
  Countgraph to resolve branches.
"""

import numpy as np

from khmer_tpu.ops import hashing as H

TRAVERSAL_RIGHT = True
TRAVERSAL_LEFT = False

# DNA_SIMPLE alphabet order (reference alphabets.cc:45) mapped to the
# 2-bit codes A=0, C=2, G=3, T=1
_ACGT_CODES = [(("A"), 0), (("C"), 2), (("G"), 3), (("T"), 1)]


def _seed_kmer(graph, seed):
    if isinstance(seed, str):
        _, f, r = H._hash_scalar(seed, graph.ksize())
    else:
        s = H.reverse_hash(int(seed), graph.ksize())
        _, f, r = H._hash_scalar(s, graph.ksize())
    return np.uint64(f), np.uint64(r)


def _neighbor(graph, f, r, base_code, direction):
    """(nf, nr, canonical) for one directional neighbor."""
    k = graph.ksize()
    bitmask = np.uint64((1 << (2 * k)) - 1)
    shift = np.uint64(2 * k - 2)
    b = np.uint64(base_code)
    comp_b = b ^ np.uint64(1)
    if direction == TRAVERSAL_RIGHT:
        nf = ((f << np.uint64(2)) | b) & bitmask
        nr = (r >> np.uint64(2)) | (comp_b << shift)
    else:
        nf = (f >> np.uint64(2)) | (b << shift)
        nr = ((r << np.uint64(2)) | comp_b) & bitmask
    return nf, nr, min(int(nf), int(nr))


class AssemblerTraverser:
    """Python mirror of AssemblerTraverser<direction>
    (traversal.cc:322-360)."""

    def __init__(self, graph, f, r, direction, filters=None,
                 visited=None):
        self.graph = graph
        self.f = f
        self.r = r
        self.direction = direction
        self.filters = list(filters) if filters else []
        self.visited = visited if visited is not None else set()

    def copy(self):
        c = AssemblerTraverser(self.graph, self.f, self.r,
                               self.direction, self.filters,
                               self.visited)
        return c

    @property
    def cursor(self):
        return min(int(self.f), int(self.r))

    def _rejected(self, canon):
        if canon in self.visited:
            return True
        for flt in self.filters:
            if flt(canon):
                return True
        return False

    def next_symbol(self):
        """Advance by one base if exactly one unfiltered neighbor."""
        self.visited.add(self.cursor)
        found = 0
        found_base = None
        next_f = next_r = None
        for base, code in _ACGT_CODES:
            nf, nr, nc = _neighbor(self.graph, self.f, self.r, code,
                                   self.direction)
            if self.graph.get(nc) and not self._rejected(nc):
                found += 1
                if found > 1:
                    return None
                found_base = base
                next_f, next_r = nf, nr
        if not found:
            return None
        self.f, self.r = next_f, next_r
        return found_base

    def neighbors(self):
        """All unfiltered directional neighbors as (f, r) pairs."""
        out = []
        for base, code in _ACGT_CODES:
            nf, nr, nc = _neighbor(self.graph, self.f, self.r, code,
                                   self.direction)
            if self.graph.get(nc) and not self._rejected(nc):
                out.append((nf, nr))
        return out

    def cursor_degree(self):
        return self.graph.kmer_degree(int(self.f), int(self.r))

    def join_contigs(self, contig_a, contig_b, offset=0):
        k = self.graph.ksize()
        if self.direction == TRAVERSAL_RIGHT:
            return contig_a + contig_b[k - offset:]
        return contig_b + contig_a[k - offset:]


def get_stop_bf_filter(stop_bf):
    return lambda canon: stop_bf.get(canon) != 0


class LinearAssembler:
    """reference assembler.cc:40-174."""

    def __init__(self, graph):
        self.graph = graph
        self._ksize = graph.ksize()

    def assemble(self, seed_kmer, stop_bf=None):
        f, r = _seed_kmer(self.graph, seed_kmer)
        if self.graph.get(min(int(f), int(r))) == 0:
            return ""
        filters = [get_stop_bf_filter(stop_bf)] if stop_bf else []
        visited = set()
        rcursor = AssemblerTraverser(self.graph, f, r, TRAVERSAL_RIGHT,
                                     filters, visited)
        lcursor = AssemblerTraverser(self.graph, f, r, TRAVERSAL_LEFT,
                                     filters, visited)
        right_contig = self._assemble_directed(rcursor)
        left_contig = self._assemble_directed(lcursor)
        return left_contig + right_contig[self._ksize:]

    def assemble_right(self, seed_kmer, stop_bf=None):
        f, r = _seed_kmer(self.graph, seed_kmer)
        filters = [get_stop_bf_filter(stop_bf)] if stop_bf else []
        cursor = AssemblerTraverser(self.graph, f, r, TRAVERSAL_RIGHT,
                                    filters)
        return self._assemble_directed(cursor)

    def assemble_left(self, seed_kmer, stop_bf=None):
        f, r = _seed_kmer(self.graph, seed_kmer)
        filters = [get_stop_bf_filter(stop_bf)] if stop_bf else []
        cursor = AssemblerTraverser(self.graph, f, r, TRAVERSAL_LEFT,
                                    filters)
        return self._assemble_directed(cursor)

    def _assemble_directed(self, cursor):
        contig = H.reverse_hash(int(cursor.f), self._ksize)
        if cursor.direction == TRAVERSAL_RIGHT:
            while True:
                base = cursor.next_symbol()
                if base is None:
                    break
                contig += base
            return contig
        else:
            chars = list(contig)[::-1]
            while True:
                base = cursor.next_symbol()
                if base is None:
                    break
                chars.append(base)
            return "".join(reversed(chars))


def get_simple_label_intersect_filter(src_labels, lh, min_cov=5):
    """reference kmer_filters.cc (True = reject); min_cov default 5
    per kmer_filters.hh:60 — the tip heuristic only fires when the
    source node carries >= 5 labels (a wrong default of 2 here made
    the labeled assembler refuse to hop 2-label SNP bubbles; caught
    by tests/test_dbg_fixtures.py)."""
    src = set(src_labels)

    def filt(canon):
        dst = set(lh.get_tag_labels(canon))
        intersect = src & dst
        if (len(intersect) == 1 and len(dst) == 1
                and len(src) >= min_cov):
            return True  # putative tip
        elif len(intersect) > 0:
            return False  # a spanning read exists
        return True

    return filt


class SimpleLabeledAssembler:
    """reference assembler.cc:181-340."""

    def __init__(self, labels_or_graphlabels):
        self.lh = labels_or_graphlabels
        self.graph = labels_or_graphlabels.graph
        self._ksize = self.graph.ksize()
        self.linear_asm = LinearAssembler(self.graph)

    def assemble(self, seed_kmer, stop_bf=None):
        f, r = _seed_kmer(self.graph, seed_kmer)
        if self.graph.get(min(int(f), int(r))) == 0:
            return []
        filters = [get_stop_bf_filter(stop_bf)] if stop_bf else []
        visited = set()
        right_paths = []
        rcursor = AssemblerTraverser(self.graph, f, r, TRAVERSAL_RIGHT,
                                     filters, visited)
        self._assemble_directed(rcursor, right_paths)
        left_paths = []
        lcursor = AssemblerTraverser(self.graph, f, r, TRAVERSAL_LEFT,
                                     filters, visited)
        self._assemble_directed(lcursor, left_paths)

        paths = []
        for lp in left_paths:
            for rp in right_paths:
                paths.append(lp + rp[self._ksize:])
        return paths

    def _assemble_directed(self, start_cursor, paths):
        root_contig = self.linear_asm._assemble_directed(start_cursor)
        segments = [root_contig]
        cursors = [start_cursor]

        while segments:
            segment = segments.pop()
            cursor = cursors.pop()
            if cursor.cursor_degree() > 1:
                labels = self.lh.get_tag_labels(cursor.cursor)
                if not labels:
                    paths.append(segment)
                    continue
                flt = get_simple_label_intersect_filter(labels, self.lh)
                cursor.filters.append(flt)
                branch_starts = cursor.neighbors()
                cursor.filters.pop()
                if not branch_starts:
                    paths.append(segment)
                    continue
                for nf, nr in branch_starts:
                    branch_cursor = cursor.copy()
                    branch_cursor.f, branch_cursor.r = nf, nr
                    branch = self.linear_asm._assemble_directed(
                        branch_cursor)
                    new_segment = branch_cursor.join_contigs(
                        segment, branch, 1)
                    segments.append(new_segment)
                    cursors.append(branch_cursor)
            else:
                paths.append(segment)


class JunctionCountAssembler:
    """reference assembler.cc:346-470."""

    def __init__(self, graph):
        from khmer_tpu.core.sketch import Countgraph

        self.graph = graph
        self._ksize = graph.ksize()
        self.junctions = Countgraph(self._ksize, 1, 0,
                                    primes=graph.hashsizes())
        self.linear_asm = LinearAssembler(graph)

    def consume(self, sequence):
        """Count junctions around high-degree nodes."""
        self.graph.consume(sequence)
        k = self._ksize
        hashes = self.graph._hashes_for_sequence(sequence)
        n = len(hashes)
        if n < 2:
            return 0
        codes = H.encode_dna(sequence)
        frs = []
        for i in range(n):
            sub = H.decode_dna(codes[i:i + k])
            _, f, r = H._hash_scalar(sub, k)
            frs.append((f, r))
        degrees = [self.graph.kmer_degree(int(f), int(r))
                   for f, r in frs]
        n_junctions = 0
        for i in range(n - 1):
            if degrees[i] > 2 or degrees[i + 1] > 2:
                self.count_junction(int(hashes[i]), int(hashes[i + 1]))
                n_junctions += 1
        return n_junctions // 2

    def count_junction(self, kmer_a, kmer_b):
        self.junctions._commit_hashes(
            np.array([kmer_a ^ kmer_b], dtype=np.uint64))

    def get_junction_count(self, kmer_a, kmer_b):
        if isinstance(kmer_a, str):
            kmer_a = self.graph.hash(kmer_a)
        if isinstance(kmer_b, str):
            kmer_b = self.graph.hash(kmer_b)
        return self.junctions.get(int(kmer_a) ^ int(kmer_b))

    def assemble(self, seed_kmer, stop_bf=None):
        """Assemble using junction counts to resolve branches
        (simplified to dead-end collection like the reference when no
        junction spans)."""
        f, r = _seed_kmer(self.graph, seed_kmer)
        if self.graph.get(min(int(f), int(r))) == 0:
            return []
        filters = [get_stop_bf_filter(stop_bf)] if stop_bf else []
        visited = set()
        right_paths = []
        rcursor = AssemblerTraverser(self.graph, f, r, TRAVERSAL_RIGHT,
                                     filters, visited)
        self._assemble_directed(rcursor, right_paths)
        left_paths = []
        lcursor = AssemblerTraverser(self.graph, f, r, TRAVERSAL_LEFT,
                                     filters, visited)
        self._assemble_directed(lcursor, left_paths)
        paths = []
        for lp in left_paths:
            for rp in right_paths:
                paths.append(lp + rp[self._ksize:])
        return paths

    def _assemble_directed(self, start_cursor, paths):
        root_contig = self.linear_asm._assemble_directed(start_cursor)
        segments = [root_contig]
        cursors = [start_cursor]
        while segments:
            segment = segments.pop()
            cursor = cursors.pop()
            if cursor.cursor_degree() > 1:
                cur = cursor.cursor
                branch_starts = [
                    (nf, nr) for nf, nr in cursor.neighbors()
                    if self.get_junction_count(cur,
                                               min(int(nf), int(nr))) > 0]
                if not branch_starts:
                    paths.append(segment)
                    continue
                for nf, nr in branch_starts:
                    branch_cursor = cursor.copy()
                    branch_cursor.f, branch_cursor.r = nf, nr
                    branch = self.linear_asm._assemble_directed(
                        branch_cursor)
                    new_segment = branch_cursor.join_contigs(
                        segment, branch, 1)
                    segments.append(new_segment)
                    cursors.append(branch_cursor)
            else:
                paths.append(segment)
