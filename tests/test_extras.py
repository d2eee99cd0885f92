"""Tests for CdC, TDA export, entropy tools, dichotomy, NN-descent,
and single-linkage clustering."""

import numpy as np
import jax.numpy as jnp
import pytest

from annembed_tpu.knn.brute import knn_graph_brute
from annembed_tpu.graph.kgraph import KGraph


def graph_of(x, k=10):
    idx, dist = knn_graph_brute(np.asarray(x, np.float32), k=k)
    return KGraph(indices=idx, dists=dist)


# --------------------------------------------------------------------------
# Carre du Champ
# --------------------------------------------------------------------------

def test_cdc_kernel_rows_are_probabilities(rng):
    from annembed_tpu.estimators.cdc import CarreDuChamp
    x = rng.normal(size=(300, 6)).astype(np.float32)
    cdc = CarreDuChamp(x, knbn=10)
    rows = cdc.kernel_rows(jnp.array([0, 5, 123]))
    sums = np.asarray(rows.sum(axis=1))
    np.testing.assert_allclose(sums, 1.0, atol=2e-3)  # rw rows sum to 1
    assert (np.asarray(rows) >= 0).all()


def test_cdc_planar_data_has_rank2_spectrum(rng):
    """Points on a 2-plane in R^6: the local covariance must have ~2
    dominant eigenvalues (the CdC recovers local dimension)."""
    from annembed_tpu.estimators.cdc import CarreDuChamp
    z = rng.normal(size=(500, 2)).astype(np.float32)
    basis, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    x = (z @ basis[:2]).astype(np.float32)
    cdc = CarreDuChamp(x, knbn=12)
    _, mat = cdc.get_cdc_at_point(10)
    s = np.asarray(mat.get_spectrum(epsil=0.05))
    assert len(s) <= 3
    full = np.linalg.eigvalsh(np.asarray(mat.mat))[::-1]
    assert full[1] > 100 * max(full[3], 1e-12)


def test_cdc_bures_distance(rng):
    from annembed_tpu.estimators.cdc import CdcMat, psd_dist_upper_bound
    # the bound is exact (0) only for identical rank-1 matrices:
    # d^2 = trA + trB - 2 sqrt(tr(AB)) = 2(sum l - sqrt(sum l^2)) > 0
    # for general equal PSD matrices — it is an UPPER bound
    v = rng.normal(size=(4, 1))
    a1 = (v @ v.T).astype(np.float32)
    m1 = CdcMat(mat=jnp.asarray(a1))
    assert psd_dist_upper_bound(m1, m1) < 1e-2
    a = rng.normal(size=(4, 4))
    a = (a @ a.T).astype(np.float32)
    m = CdcMat(mat=jnp.asarray(a))
    assert psd_dist_upper_bound(m, m) >= 0
    b = CdcMat(mat=jnp.asarray(2.0 * a))
    assert psd_dist_upper_bound(m, b) > 0


def test_cdc_apply_f_identity_matches_cdc(rng):
    from annembed_tpu.estimators.cdc import CarreDuChamp
    x = rng.normal(size=(200, 3)).astype(np.float32)
    cdc = CarreDuChamp(x, knbn=8)
    _, mat = cdc.get_cdc_at_point(7)
    ident = cdc.apply_fvec(7, lambda v: v, lambda v: v)
    np.testing.assert_allclose(np.asarray(ident), np.asarray(mat.mat),
                               rtol=1e-3, atol=1e-5)


# --------------------------------------------------------------------------
# TDA export
# --------------------------------------------------------------------------

def test_bson_limat_roundtrip(tmp_path, rng):
    from annembed_tpu.io.ripser import write_bson_limat, read_bson_limat
    vals = rng.random(20).tolist()
    p = tmp_path / "x.bson"
    write_bson_limat(str(p), vals)
    back = read_bson_limat(str(p))
    np.testing.assert_allclose(back, vals, rtol=1e-12)


def test_extract_neighbourhood(tmp_path, rng):
    from annembed_tpu.io.ripser import extract_neighbourhood, \
        read_bson_limat
    x = rng.normal(size=(200, 5)).astype(np.float32)
    p = tmp_path / "n.bson"
    nb = extract_neighbourhood(x, x[0], knbn=10, outbson=str(p))
    tri = read_bson_limat(str(p))
    assert len(tri) == nb * (nb + 1) // 2
    # diagonal zeros present at triangular positions
    diag_pos = np.cumsum(np.arange(1, nb + 1)) - 1
    np.testing.assert_allclose(tri[diag_pos], 0.0)


def test_ripser_sparse_dump(tmp_path, rng):
    from annembed_tpu.io.ripser import to_ripser_sparse_dist
    x = rng.normal(size=(30, 4)).astype(np.float32)
    g = graph_of(x, k=4)
    p = tmp_path / "g.txt"
    to_ripser_sparse_dist(g, str(p))
    lines = open(p).read().strip().split("\n")
    assert len(lines) == 30 * 4 * 2
    i, j, w = lines[0].split()
    assert float(w) >= 0


# --------------------------------------------------------------------------
# entropy + dichotomy
# --------------------------------------------------------------------------

def test_entropy_values():
    from annembed_tpu.utils.entropy import (shannon_entropy, renyi_entropy,
                                            relative_renyi_entropy,
                                            perplexity)
    p = np.full(8, 1 / 8)
    np.testing.assert_allclose(float(shannon_entropy(p)), np.log(8),
                               rtol=1e-5)
    np.testing.assert_allclose(float(perplexity(p)), 8.0, rtol=1e-5)
    np.testing.assert_allclose(float(renyi_entropy(p, 2.0)), np.log(8),
                               rtol=1e-5)
    q = np.array([0.5, 0.5, 0, 0, 0, 0, 0, 0])
    kl = float(relative_renyi_entropy(q, p, 1.0))
    np.testing.assert_allclose(kl, np.log(4), rtol=1e-4)


def test_dichotomy_sqrt2():
    from annembed_tpu.utils.dichotomy import dichotomy_solver
    root = dichotomy_solver(True, lambda x: x * x, 0.0, 5.0, 2.0)
    np.testing.assert_allclose(root, np.sqrt(2), rtol=1e-5)
    # decreasing function (reference dichotomy.rs:74-90 tests both)
    root = dichotomy_solver(False, lambda x: -x, -3.0, 5.0, -2.0)
    np.testing.assert_allclose(root, 2.0, atol=1e-5)


# --------------------------------------------------------------------------
# NN-descent
# --------------------------------------------------------------------------

def test_nndescent_improves_degraded_graph(rng):
    from annembed_tpu.knn.nndescent import nndescent_refine
    from annembed_tpu.knn.api import recall_at_k
    x = rng.normal(size=(800, 8)).astype(np.float32)
    exact_idx, exact_dist = knn_graph_brute(x, k=8)
    # degrade: replace half the neighbours by random ones
    idx = np.asarray(exact_idx).copy()
    dist = np.asarray(exact_dist).copy()
    corrupt = rng.integers(0, 800, size=(800, 4)).astype(np.int32)
    idx[:, 4:] = corrupt
    dist[:, 4:] = np.linalg.norm(x - x[corrupt[:, 0]], axis=1)[:, None]
    r0 = recall_at_k(idx, exact_idx)
    ridx, rdist = nndescent_refine(x, jnp.asarray(idx), jnp.asarray(dist),
                                   n_rounds=3)
    r1 = recall_at_k(ridx, exact_idx)
    assert r1 > r0 + 0.2, (r0, r1)
    assert r1 > 0.95, r1


@pytest.mark.slow
def test_nndescent_no_duplicate_neighbours(rng):
    """Two candidate copies of the same node (reached via different
    lists) must not both enter the merged top-k (dedup regression:
    ~3% duplicate edges on clustered data before the id-sort mask)."""
    from annembed_tpu.knn.ivf import knn_graph_ivf
    from annembed_tpu.knn.nndescent import nndescent_refine
    centers = rng.normal(size=(12, 8)) * 3
    x = (centers[rng.integers(0, 12, 2500)]
         + 0.4 * rng.normal(size=(2500, 8))).astype(np.float32)
    ai, ad = knn_graph_ivf(x, 8, nprobe=4, nlist=36)
    for rho in (1.0, 0.5):
        i2, d2 = nndescent_refine(x, ai, ad, n_rounds=2, rho=rho)
        i2 = np.asarray(i2)
        dups = sum(len(r) - len(set(r.tolist())) for r in i2)
        assert dups == 0, (rho, dups)
        assert (np.diff(np.asarray(d2), axis=1) >= -1e-6).all()


@pytest.mark.slow
def test_nndescent_rho_sampling_recall(rng):
    """rho-sampled rounds converge to full-join recall with ~rho^-1
    extra rounds (Dong's sampling); the sampled join must also beat
    the unrefined graph decisively."""
    from annembed_tpu.knn.ivf import knn_graph_ivf
    from annembed_tpu.knn.nndescent import nndescent_refine
    from annembed_tpu.knn.api import recall_at_k
    centers = rng.normal(size=(10, 8)) * 3
    x = (centers[rng.integers(0, 10, 2500)]
         + 0.4 * rng.normal(size=(2500, 8))).astype(np.float32)
    exact_idx, _ = knn_graph_brute(x, k=8)
    ai, ad = knn_graph_ivf(x, 8, nprobe=4, nlist=36)
    r0 = recall_at_k(ai, exact_idx)
    i_full, _ = nndescent_refine(x, ai, ad, n_rounds=2, rho=1.0)
    i_samp, _ = nndescent_refine(x, ai, ad, n_rounds=4, rho=0.5)
    r_full = recall_at_k(i_full, exact_idx)
    r_samp = recall_at_k(i_samp, exact_idx)
    assert r_samp > r0
    assert r_samp > r_full - 0.02, (r0, r_full, r_samp)


# --------------------------------------------------------------------------
# single linkage
# --------------------------------------------------------------------------

def test_kruskal_mst_spanning(rng):
    from annembed_tpu.estimators.hdbscan import kruskal_mst
    x = rng.normal(size=(100, 3)).astype(np.float32)
    g = graph_of(x, k=8)
    mst = kruskal_mst(g)
    assert mst.shape[0] <= 99
    assert (np.diff(np.sort(mst[:, 2])) >= 0).all()


def test_single_linkage_separates_blobs(rng):
    from annembed_tpu.estimators.hdbscan import single_linkage
    a = rng.normal(size=(60, 4))
    b = rng.normal(size=(60, 4)) + 50.0
    x = np.concatenate([a, b]).astype(np.float32)
    g = graph_of(x, k=6)
    dend = single_linkage(g)
    labels = dend.cluster_by_distance(10.0)
    # two well-separated blobs -> exactly 2 clusters, aligned with truth
    assert len(np.unique(labels)) == 2
    assert len(np.unique(labels[:60])) == 1
    assert len(np.unique(labels[60:])) == 1
    # linkage sizes: final merge contains everyone iff graph connected
    sizes = dend.linkage[:, 3]
    assert sizes.max() <= 120


def test_boruvka_matches_kruskal(rng):
    """All MSTs of a graph share one weight multiset (even with ties);
    Boruvka must reproduce Kruskal's, at equal edge count, on dense,
    tie-heavy (mutual-reachability) and disconnected graphs."""
    from annembed_tpu.estimators.hdbscan import (kruskal_mst, boruvka_mst,
                                                 mutual_reachability)
    cases = []
    cases.append(graph_of(rng.normal(size=(200, 5)).astype(np.float32), k=7))
    two = np.concatenate([rng.normal(size=(80, 3)),
                          rng.normal(size=(80, 3)) + 100.0])
    cases.append(graph_of(two.astype(np.float32), k=6))       # forest
    g3 = graph_of(rng.normal(size=(150, 4)).astype(np.float32), k=9)
    cases.append(mutual_reachability(g3, 6))                  # many ties
    for g in cases:
        mk, mb = kruskal_mst(g), boruvka_mst(g)
        assert mk.shape == mb.shape
        np.testing.assert_allclose(np.sort(mk[:, 2]), np.sort(mb[:, 2]),
                                   rtol=1e-12)
        # boruvka edges must form the same forest (acyclic, spanning):
        # same component structure at full height
        from annembed_tpu.estimators.hdbscan import UnionFind
        for m in (mk, mb):
            uf = UnionFind(g.nb_nodes)
            for a, b, _ in m:
                assert uf.union(int(a), int(b))   # no cycles
        ra = [UnionFind(g.nb_nodes) for _ in range(2)]
        for m, uf in zip((mk, mb), ra):
            for a, b, _ in m:
                uf.union(int(a), int(b))
        r0 = np.array([ra[0].find(i) for i in range(g.nb_nodes)])
        r1 = np.array([ra[1].find(i) for i in range(g.nb_nodes)])
        _, c0 = np.unique(r0, return_inverse=True)
        _, c1 = np.unique(r1, return_inverse=True)
        assert (c0 == c1).all() or len(np.unique(c0)) == len(np.unique(c1))


def test_native_condense_bit_identical(rng):
    """Native condensed-tree builder is a faithful port: bit-identical
    rows to the Python walk, in connected and forest topologies."""
    from annembed_tpu.estimators.hdbscan import (single_linkage,
                                                 condensed_tree,
                                                 mutual_reachability,
                                                 _native_mst_lib)
    if _native_mst_lib() is None:
        pytest.skip("libannembed_native unavailable")
    for xs in (rng.normal(size=(300, 4)),
               np.concatenate([rng.normal(size=(150, 4)),
                               rng.normal(size=(150, 4)) + 80])):
        g = mutual_reachability(graph_of(xs.astype(np.float32), k=8), 5)
        dend = single_linkage(g)
        for mcs in (5, 25):
            assert np.array_equal(condensed_tree(dend, mcs, use_native=True),
                                  condensed_tree(dend, mcs, use_native=False))


def test_native_kruskal_bit_identical(rng):
    """Native C++ Kruskal uses the same stable weight sort as numpy's
    kind='stable' argsort — outputs must be bit-identical.  Skipped if
    the native library didn't build."""
    from annembed_tpu.estimators.hdbscan import kruskal_mst, _native_mst_lib
    if _native_mst_lib() is None:
        pytest.skip("libannembed_native unavailable")
    x = rng.normal(size=(300, 5)).astype(np.float32)
    g = graph_of(x, k=9)
    assert np.array_equal(kruskal_mst(g, use_native=True),
                          kruskal_mst(g, use_native=False))


def test_single_linkage_mst_methods_agree(rng):
    """Dendrogram heights and flat cuts agree between MST backends."""
    from annembed_tpu.estimators.hdbscan import single_linkage
    a = rng.normal(size=(70, 4))
    b = rng.normal(size=(70, 4)) + 12.0
    g = graph_of(np.concatenate([a, b]).astype(np.float32), k=8)
    dk = single_linkage(g, mst_method="kruskal")
    db = single_linkage(g, mst_method="boruvka")
    np.testing.assert_allclose(np.sort(dk.linkage[:, 2]),
                               np.sort(db.linkage[:, 2]), rtol=1e-12)
    for thr in (0.5, 2.0, 8.0):
        lk = dk.cluster_by_distance(thr)
        lb = db.cluster_by_distance(thr)
        # same partition up to label permutation
        assert len(np.unique(lk)) == len(np.unique(lb))
        pairs = set(zip(lk.tolist(), lb.tolist()))
        assert len(pairs) == len(np.unique(lk))


def test_mutual_reachability_floor(rng):
    from annembed_tpu.estimators.hdbscan import mutual_reachability
    x = rng.normal(size=(50, 3)).astype(np.float32)
    g = graph_of(x, k=8)
    gm = mutual_reachability(g, min_samples=5)
    # core = distance to the 5th nearest neighbour COUNTING self
    # (HDBSCAN*/sklearn convention) = column 3 of the self-excluding
    # graph
    core = np.asarray(g.dists)[:, 3]
    d = np.asarray(gm.dists)
    gi = np.asarray(gm.indices)
    # rows re-sorted ascending (KGraph contract)
    assert (np.diff(d, axis=1) >= 0).all()
    # same neighbour sets, just reordered
    assert np.array_equal(np.sort(gi, 1), np.sort(np.asarray(g.indices), 1))
    # every mreach distance >= both endpoints' core distances and the
    # original pair distance
    assert (d >= core[:, None] - 1e-6).all()
    assert (d >= core[gi] - 1e-6).all()
    orig = {(i, int(j)): float(w) for i, (row, wr) in
            enumerate(zip(np.asarray(g.indices), np.asarray(g.dists)))
            for j, w in zip(row, wr)}
    for i in range(d.shape[0]):
        for j, w in zip(gi[i], d[i]):
            assert w >= orig[(i, int(j))] - 1e-6


def test_hdbscan_three_blobs_plus_noise(rng):
    """Full HDBSCAN*: disconnected components (forest MST) must each
    surface as clusters; uniform background points are mostly noise."""
    from annembed_tpu.estimators.hdbscan import hdbscan
    a = rng.normal(size=(80, 4))
    b = rng.normal(size=(80, 4)) + 30.0
    c = rng.normal(size=(80, 4)) - 30.0
    bg = rng.uniform(-60, 60, size=(12, 4))
    x = np.concatenate([a, b, c, bg]).astype(np.float32)
    res = hdbscan(graph_of(x, k=10), min_cluster_size=15)
    assert len(res.selected) == 3
    for blk in (slice(0, 80), slice(80, 160), slice(160, 240)):
        lbl = res.labels[blk]
        assert (lbl >= 0).all()
        assert len(np.unique(lbl)) == 1          # each blob pure
    assert len(np.unique(res.labels[:240])) == 3  # distinct clusters
    p = res.probabilities
    assert (p[res.labels >= 0] > 0).all() and (p <= 1.0).all()
    assert (p[res.labels == -1] == 0).all()
    # sparse background points either drop out as noise or attach with
    # far lower membership probability than the dense blob cores
    bg_conf = np.where(res.labels[240:] == -1, 0.0, p[240:])
    assert np.median(bg_conf) < 0.3 < np.median(p[:240])


def test_hdbscan_single_cluster_semantics(rng):
    from annembed_tpu.estimators.hdbscan import hdbscan
    x = rng.normal(size=(100, 4)).astype(np.float32)
    g = graph_of(x, k=10)
    # one connected blob: root unselectable by default -> all noise
    assert (hdbscan(g, min_cluster_size=25).labels == -1).all()
    r = hdbscan(g, min_cluster_size=25, allow_single_cluster=True)
    assert (r.labels == 0).all()


def test_embed_cluster_byproduct(rng, tmp_path):
    """api.embed(cluster=mcs) clusters the pipeline's own kNN graph and
    writes clusters.csv next to the embedding."""
    from annembed_tpu.api import embed
    x = np.concatenate([rng.normal(size=(150, 6)),
                        rng.normal(size=(150, 6)) + 30]).astype(np.float32)
    out = tmp_path / "emb.csv"
    y, info = embed(x, outfile=str(out), dim=2, batch=4, cluster=60)
    c = info["cluster"]
    assert c["n_clusters"] == 2 and c["noise_fraction"] <= 0.05
    assert len(np.unique(c["labels"][:150])) == 1
    assert len(np.unique(c["labels"][150:])) == 1
    lab = np.loadtxt(tmp_path / "clusters.csv", delimiter=",")
    assert lab.shape == (300, 3)
    assert np.array_equal(lab[:, 0].astype(int), c["labels"])


def test_glosh_outlier_scores(rng):
    """Sparse background points must score as stronger outliers than
    dense blob cores; scores live in [0, 1]."""
    from annembed_tpu.estimators.hdbscan import (hdbscan, outlier_scores,
                                                 mutual_reachability,
                                                 single_linkage,
                                                 condensed_tree)
    a = rng.normal(size=(100, 3))
    bg = rng.uniform(-20, 20, size=(15, 3))
    x = np.concatenate([a, bg]).astype(np.float32)
    g = mutual_reachability(graph_of(x, k=10), 5)
    cond = condensed_tree(single_linkage(g), min_cluster_size=20)
    s = outlier_scores(cond, 115)
    assert (0.0 <= s).all() and (s <= 1.0).all()
    assert np.median(s[100:]) > np.median(s[:100]) + 0.2


def test_hdbscan_matches_sklearn_on_complete_graph(rng):
    """On the complete graph (k = n-1) our HDBSCAN* sees the same
    metric as sklearn's; labelings must agree (ARI ~ 1).  kNN-graph
    runs may legitimately over-segment where the graph is sparse."""
    sk_cluster = pytest.importorskip("sklearn.cluster")
    from sklearn.metrics import adjusted_rand_score
    from annembed_tpu.estimators.hdbscan import hdbscan
    t = rng.uniform(0, np.pi, 150)
    m0 = np.stack([np.cos(t), np.sin(t)], 1) + rng.normal(0, .08, (150, 2))
    m1 = np.stack([1 - np.cos(t), .5 - np.sin(t)], 1) + rng.normal(0, .08, (150, 2))
    x = np.concatenate([m0, m1]).astype(np.float32)
    sk = sk_cluster.HDBSCAN(min_cluster_size=20, min_samples=10).fit(x)
    res = hdbscan(graph_of(x, k=299), min_cluster_size=20, min_samples=10)
    # near-exact since the core-distance convention matches sklearn's
    # self-inclusive min_samples (was 0.9 under the off-by-one)
    assert adjusted_rand_score(sk.labels_, res.labels) >= 0.97


def test_cluster_selection_epsilon_and_leaf(rng):
    """Malzer-Baum epsilon search repairs kNN-sparsity
    over-segmentation (two moons at k=15 split 3-ways under plain EOM);
    'leaf' returns the finest-grained clusters."""
    from annembed_tpu.estimators.hdbscan import hdbscan
    sk_metrics = pytest.importorskip("sklearn.metrics")
    t = rng.uniform(0, np.pi, 300)
    m0 = np.stack([np.cos(t), np.sin(t)], 1) + rng.normal(0, .08, (300, 2))
    m1 = np.stack([1 - np.cos(t), .5 - np.sin(t)], 1) + rng.normal(0, .08, (300, 2))
    g = graph_of(np.concatenate([m0, m1]).astype(np.float32), k=15)
    truth = np.repeat([0, 1], 300)
    plain = hdbscan(g, min_cluster_size=30, min_samples=10)
    eps = hdbscan(g, min_cluster_size=30, min_samples=10,
                  cluster_selection_epsilon=0.3)
    assert len(eps.selected) <= len(plain.selected)
    assert sk_metrics.adjusted_rand_score(truth, eps.labels) >= 0.9
    leaf = hdbscan(g, min_cluster_size=30, min_samples=10,
                   cluster_selection_method="leaf")
    assert len(leaf.selected) >= len(plain.selected)


def test_condensed_tree_invariants(rng):
    from annembed_tpu.estimators.hdbscan import single_linkage, condensed_tree
    a = rng.normal(size=(60, 3))
    b = rng.normal(size=(60, 3)) + 8.0    # close enough to stay connected? any case works
    x = np.concatenate([a, b]).astype(np.float32)
    cond = condensed_tree(single_linkage(graph_of(x, k=8)), min_cluster_size=10)
    n = 120
    pts = cond[cond[:, 1] < n]
    # every point leaves exactly one cluster, with unit size
    assert len(pts) == len(np.unique(pts[:, 1].astype(int)))
    assert (pts[:, 3] == 1).all()
    # cluster rows carry the subtree point count
    clus = cond[cond[:, 1] >= n]
    assert (clus[:, 3] >= 10).all()
    assert (cond[:, 2] > 0).all()


# --------------------------------------------------------------------------
# visualization
# --------------------------------------------------------------------------

def test_viz_plots(tmp_path, rng):
    from annembed_tpu import viz
    coords = rng.normal(size=(200, 2)).astype(np.float32)
    labels = rng.integers(0, 5, 200)
    p1 = viz.plot_embedding(coords, labels, out=str(tmp_path / "e.png"))
    assert (tmp_path / "e.png").exists()
    ratio = rng.random(200)
    viz.plot_continuity(coords, ratio, out=str(tmp_path / "c.png"))
    assert (tmp_path / "c.png").exists()
    viz.plot_first_dist_density(ratio, out=str(tmp_path / "d.png"))
    assert (tmp_path / "d.png").exists()


def test_projection_ripser_dump(tmp_path, rng):
    from annembed_tpu.io.ripser import extract_projection_to_ripserer
    x = rng.normal(size=(300, 5)).astype(np.float32)
    p = tmp_path / "proj.txt"
    quants = extract_projection_to_ripserer(x, knbn=5, fname=str(p),
                                            sample_fraction=0.2)
    assert p.exists()
    assert quants["q0.5"] >= 0
    n_lines = len(open(p).read().strip().split("\n"))
    assert n_lines == 2 * 5 * round(300 * 0.2)


def test_phase_timer():
    import time as _t
    from annembed_tpu.utils.profiling import PhaseTimer, device_trace
    pt = PhaseTimer()
    with pt.phase("a") as out:
        _t.sleep(0.01)
        out.append(jnp.ones((4,)))
    with pt.phase("b"):
        pass
    s = pt.summary()
    assert s["a"] >= 0.01 and "b" in s and s["total"] >= s["a"]
    with device_trace(None):
        pass  # no-op path
