"""Single-linkage clustering over the kNN graph.

Rebuilds (and completes) reference src/hdbscan/: union-find +
Kruskal MST (kruskal.rs:19,100) and the single-linkage dendrogram that
the reference's ``SLclustering::cluster`` leaves unfinished
(sl.rs:149-177 ends at TODOs).  Graph-side work (edge extraction) is
device arrays; the MST itself is inherently sequential and runs
host-side in numpy, as the reference's does on CPU.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..graph.kgraph import KGraph


class UnionFind:
    """Path-halving union-find (reference hdbscan/kruskal.rs:19)."""

    def __init__(self, n: int):
        self.parent = np.arange(n)
        self.rank = np.zeros(n, np.int32)

    def find(self, i: int) -> int:
        p = self.parent
        while p[i] != i:
            p[i] = p[p[i]]
            i = p[i]
        return int(i)

    def union(self, a: int, b: int) -> bool:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return False
        if self.rank[ra] < self.rank[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        if self.rank[ra] == self.rank[rb]:
            self.rank[ra] += 1
        return True


def kruskal_mst(g: KGraph) -> np.ndarray:
    """(m, 3) MST/forest edges [src, dst, weight] of the kNN graph,
    weight-ascending (kruskal.rs:100 ``kruskal_indices``)."""
    idx = np.asarray(g.indices)
    dist = np.asarray(g.dists)
    n, k = idx.shape
    src = np.repeat(np.arange(n), k)
    dst = idx.reshape(-1)
    w = dist.reshape(-1)
    order = np.argsort(w, kind="stable")
    uf = UnionFind(n)
    out = []
    for e in order:
        if uf.union(int(src[e]), int(dst[e])):
            out.append((src[e], dst[e], w[e]))
            if len(out) == n - 1:
                break
    return np.array(out, dtype=np.float64).reshape(-1, 3)


@dataclasses.dataclass
class Dendrogram:
    """scipy-style linkage matrix: row i merges clusters
    [cluster_a, cluster_b] at ``distance`` into new cluster
    n_points + i with ``size`` members."""
    linkage: np.ndarray   # (m, 4)
    mst: np.ndarray       # (m, 3) the underlying MST edges
    n_points: int

    def cluster_by_distance(self, threshold: float) -> np.ndarray:
        """Flat clusters by cutting at ``threshold``: connected
        components of MST edges with weight <= threshold (the step the
        reference's cluster() never reached, sl.rs:172-176)."""
        n = self.n_points
        uf = UnionFind(n)
        for a, b, w in self.mst:
            if w <= threshold:
                uf.union(int(a), int(b))
        roots = np.array([uf.find(i) for i in range(n)])
        _, labels = np.unique(roots, return_inverse=True)
        return labels


def single_linkage(g: KGraph) -> Dendrogram:
    """Single-linkage dendrogram from the MST (completes sl.rs:109)."""
    mst = kruskal_mst(g)
    n = g.nb_nodes
    m = mst.shape[0]
    uf = UnionFind(n)
    label_of_root = np.arange(n, dtype=np.int64)    # indexed by root point
    size_of_label = np.ones(n + m, dtype=np.int64)
    linkage = np.zeros((m, 4))
    for row in range(m):
        a, b, w = int(mst[row, 0]), int(mst[row, 1]), mst[row, 2]
        ra, rb = uf.find(a), uf.find(b)
        la, lb = label_of_root[ra], label_of_root[rb]
        new_label = n + row
        size_of_label[new_label] = size_of_label[la] + size_of_label[lb]
        linkage[row] = (la, lb, w, size_of_label[new_label])
        uf.union(ra, rb)
        label_of_root[uf.find(ra)] = new_label
    return Dendrogram(linkage=linkage, mst=mst, n_points=n)
