"""Graph traversal: batched-frontier BFS matching the reference's
FIFO-queue semantics exactly.

The reference (src/oxli/hashgraph.cc:420-570, src/oxli/traversal.cc)
pops one k-mer at a time, probing 4 right then 4 left neighbors. Here a
whole queue level is probed in one device batch; nodes are deduplicated
at pop time in queue order, so visit order, threshold truncation, and
keeper membership match the sequential reference bit-for-bit.

K-mers travel as (f, r) uint64 pairs (forward / reverse-complement
2-bit encodings); canonical id = min(f, r).
"""

import numpy as np


def _probe_neighbors(graph, fs, rs):
    """Batched neighbor probe.

    Returns (nf, nr, ncanon, present) numpy arrays, shape [N, 8]:
    neighbor order is right A,T,C,G then left A,T,C,G - matching
    NodeGatherer (src/oxli/traversal.cc:100-133).
    """
    from khmer_tpu.core import hostengine

    if hostengine.use_host_for(graph, "graph"):
        return hostengine.host_neighbors_batch(graph, fs, rs)
    M = max(len(fs), 1)
    pad_f = np.zeros(M, np.uint64)
    pad_r = np.zeros(M, np.uint64)
    pad_f[: len(fs)] = fs
    pad_r[: len(rs)] = rs
    nf, nr, nc, present = graph.neighbors_batch(pad_f, pad_r)
    n = len(fs)
    return (np.asarray(nf)[:n], np.asarray(nr)[:n],
            np.asarray(nc)[:n], np.asarray(present)[:n])


def bfs(graph, start_f, start_r, *, threshold=0, radius=None,
        max_count=0, stop_tags=None, keeper=None, break_on_circum=False):
    """FIFO BFS from one k-mer.

    Returns (count, keeper) where keeper is the set of visited canonical
    hashes. Mirrors calc_connected_graph_size (threshold) and
    traverse_from_kmer (radius/max_count) semantics.
    """
    if keeper is None:
        keeper = set()
    if stop_tags is None:
        stop_tags = graph.stop_tags
    count = 0
    # queue entries: (f, r, breadth)
    queue = [(np.uint64(start_f), np.uint64(start_r), 0)]
    while queue:
        # pop the whole queue as one level batch, dedup in order
        level = queue
        queue = []
        survivors = []
        stop = False
        for f, r, breadth in level:
            if radius is not None and breadth > radius:
                stop = True
                break
            if max_count and count > max_count:
                stop = True
                break
            c = int(min(f, r))
            if c in keeper:
                continue
            if c in stop_tags:
                continue
            keeper.add(c)
            count += 1
            if threshold and count >= threshold:
                return count, keeper
            survivors.append((f, r, breadth))
        if stop or not survivors:
            break
        fs = np.array([s[0] for s in survivors], np.uint64)
        rs = np.array([s[1] for s in survivors], np.uint64)
        nf, nr, nc, present = _probe_neighbors(graph, fs, rs)
        if break_on_circum:
            # high-circumference filter: skip neighbors with degree > 4
            deg_f = nf[present.nonzero()[0], present.nonzero()[1]]
            _, _, _, npres = _probe_neighbors(
                graph, nf[present].ravel(), nr[present].ravel())
            degs = npres.sum(axis=1)
            mask = np.zeros_like(present)
            mask[present] = degs <= 4
            present = present & mask
        for i, (f, r, breadth) in enumerate(survivors):
            for j in range(8):
                if present[i, j]:
                    queue.append((nf[i, j], nr[i, j], breadth + 1))
    return count, keeper


def calc_connected_graph_size(graph, kmer, max_size=0,
                              break_on_circum=False):
    """Component size via BFS (reference hashgraph.cc:420-471)."""
    from khmer_tpu.core import hostengine
    from khmer_tpu.ops import hashing as H

    if isinstance(kmer, str):
        _, f, r = H._hash_scalar(kmer, graph.ksize())
    else:
        s = H.reverse_hash(int(kmer), graph.ksize())
        _, f, r = H._hash_scalar(s, graph.ksize())
    if graph.get(int(min(f, r))) == 0:
        return 0
    if hostengine.use_host_for(graph, "graph") and not break_on_circum:
        count, _ = hostengine.traverse_from_kmer(
            graph, min(int(f), int(r)), threshold=max_size)
        return count
    count, _ = bfs(graph, f, r, threshold=max_size,
                   break_on_circum=break_on_circum)
    return count


def traverse_from_kmer(graph, kmer, radius, max_count=0, keeper=None):
    """Bounded-radius BFS (reference hashgraph.cc:503-570)."""
    from khmer_tpu.core import hostengine
    from khmer_tpu.ops import hashing as H

    if isinstance(kmer, str):
        _, f, r = H._hash_scalar(kmer, graph.ksize())
    else:
        s = H.reverse_hash(int(kmer), graph.ksize())
        _, f, r = H._hash_scalar(s, graph.ksize())
    if hostengine.use_host_for(graph, "graph") and not keeper:
        count, found = hostengine.traverse_from_kmer(
            graph, min(int(f), int(r)), radius=radius,
            max_count=max_count)
        if keeper is not None:
            keeper.update(found)
        return count
    count, _ = bfs(graph, f, r, radius=radius, max_count=max_count,
                   keeper=keeper if keeper is not None else set())
    return count


def traverse_linear_path(graph, kmer, adjacencies=None, visited=None,
                         stop_filter=None):
    """Walk a linear (degree<=2) path from kmer in both directions.

    Returns (size, conns, visited): path length, the adjacent
    high-degree nodes, and visited set. Reference: hashgraph.cc:843-890.
    """
    from khmer_tpu.ops import hashing as H

    k = graph.ksize()
    if isinstance(kmer, str):
        _, f, r = H._hash_scalar(kmer, k)
    else:
        s = H.reverse_hash(int(kmer), k)
        _, f, r = H._hash_scalar(s, k)
    if visited is None:
        visited = set()
    if adjacencies is None:
        adjacencies = set()
    degree_nodes = adjacencies
    size = 0
    to_visit = [(f, r)]
    while to_visit:
        # batch the whole pending stack into ONE device probe (the
        # reference pops one node per loop, hashgraph.cc:843-890; the
        # outputs are sets/counts, so processing order is immaterial
        # and a level batch is output-identical)
        batch = []
        seen_here = set()
        for cf, cr in to_visit:
            c = int(min(cf, cr))
            if c in visited or c in seen_here:
                continue
            if stop_filter is not None and stop_filter(c):
                continue
            seen_here.add(c)
            batch.append((cf, cr, c))
        to_visit = []
        if not batch:
            break
        nf, nr, nc, present = _probe_neighbors(
            graph,
            np.array([b[0] for b in batch], np.uint64),
            np.array([b[1] for b in batch], np.uint64))
        degs = present.sum(axis=1)
        for i, (cf, cr, c) in enumerate(batch):
            if degs[i] > 2:
                degree_nodes.add(c)
                continue
            visited.add(c)
            size += 1
            for j in range(8):
                if present[i, j]:
                    if int(nc[i, j]) not in visited:
                        to_visit.append((nf[i, j], nr[i, j]))
    return size, degree_nodes, visited
