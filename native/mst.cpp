// Native MST + single-linkage builders for annembed_tpu.estimators.hdbscan.
//
// The MST union loop and the dendrogram build are inherently sequential
// (each union depends on all previous ones), so they live here on the
// C++ side — the TPU-native analogue of the reference keeping its
// hdbscan/kruskal (kruskal.rs) on the CPU — while all graph-side array
// work stays on device.  C ABI, consumed via ctypes with a
// numpy/Python fallback in estimators/hdbscan.py.

#include <algorithm>
#include <cstdint>
#include <numeric>
#include <vector>

namespace {

// Path-halving union-find (mirrors the Python UnionFind semantics).
struct UnionFind {
  std::vector<int64_t> parent;
  std::vector<int32_t> rank;
  explicit UnionFind(int64_t n) : parent(n), rank(n, 0) {
    std::iota(parent.begin(), parent.end(), 0);
  }
  int64_t find(int64_t i) {
    while (parent[i] != i) {
      parent[i] = parent[parent[i]];
      i = parent[i];
    }
    return i;
  }
  bool unite(int64_t a, int64_t b) {
    int64_t ra = find(a), rb = find(b);
    if (ra == rb) return false;
    if (rank[ra] < rank[rb]) std::swap(ra, rb);
    parent[rb] = ra;
    if (rank[ra] == rank[rb]) ++rank[ra];
    return true;
  }
};

}  // namespace

extern "C" {

// Kruskal MST/forest of a kNN graph.
//   idx:  (n, k) int32 neighbour ids
//   dist: (n, k) float32 weights
//   out:  caller-allocated (n-1) * 3 doubles; rows [src, dst, w],
//         weight-ascending (stable in edge order, matching numpy's
//         stable argsort tie behaviour)
//   out_m: number of MST rows written (n - #components)
// Returns 0 on success.
int32_t annembed_kruskal(const int32_t* idx, const float* dist, int64_t n,
                         int64_t k, double* out, int64_t* out_m) {
  if (n <= 0 || k <= 0) {
    *out_m = 0;
    return 0;
  }
  const int64_t e = n * k;
  std::vector<int64_t> order(e);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [dist](int64_t a, int64_t b) {
    return dist[a] < dist[b];
  });
  UnionFind uf(n);
  int64_t m = 0;
  for (int64_t oi = 0; oi < e && m < n - 1; ++oi) {
    const int64_t ei = order[oi];
    const int64_t s = ei / k;
    const int64_t d = idx[ei];
    if (uf.unite(s, d)) {
      out[m * 3 + 0] = static_cast<double>(s);
      out[m * 3 + 1] = static_cast<double>(d);
      out[m * 3 + 2] = static_cast<double>(dist[ei]);
      ++m;
    }
  }
  *out_m = m;
  return 0;
}

// scipy-style linkage matrix from weight-ascending MST rows.
//   mst:     (m, 3) doubles [src, dst, w]
//   linkage: caller-allocated (m, 4) doubles; row i merges condensed
//            labels [a, b] at distance w into cluster n + i of the
//            written size (same contract as Python single_linkage)
int32_t annembed_linkage(const double* mst, int64_t m, int64_t n,
                         double* linkage) {
  UnionFind uf(n);
  std::vector<int64_t> label_of_root(n);
  std::iota(label_of_root.begin(), label_of_root.end(), 0);
  std::vector<int64_t> size_of_label(n + m, 1);
  for (int64_t row = 0; row < m; ++row) {
    const int64_t a = static_cast<int64_t>(mst[row * 3 + 0]);
    const int64_t b = static_cast<int64_t>(mst[row * 3 + 1]);
    const double w = mst[row * 3 + 2];
    const int64_t ra = uf.find(a), rb = uf.find(b);
    if (ra == rb) return 1;  // malformed MST (cycle)
    const int64_t la = label_of_root[ra], lb = label_of_root[rb];
    const int64_t nl = n + row;
    size_of_label[nl] = size_of_label[la] + size_of_label[lb];
    linkage[row * 4 + 0] = static_cast<double>(la);
    linkage[row * 4 + 1] = static_cast<double>(lb);
    linkage[row * 4 + 2] = w;
    linkage[row * 4 + 3] = static_cast<double>(size_of_label[nl]);
    uf.unite(ra, rb);
    label_of_root[uf.find(ra)] = nl;
  }
  return 0;
}

}  // extern "C"
