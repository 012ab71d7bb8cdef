// Native host-side solvers for annealing_sign_problem_tpu.
//
// The TPU owns the replica-parallel annealing hot loop; these are the
// inherently sequential host algorithms that the reference implements in
// external native libraries (ising_glass_annealer's deterministic greedy
// solver, README.md:25-26, Python prototype common.py:298-438) plus the
// graph-coloring preprocessing for the TPU annealer.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libaspsolvers.so solvers.cpp
// Interface: plain C ABI consumed via ctypes (no pybind11 dependency).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// First-fit greedy coloring over a symmetric CSR graph.
// Returns the number of colors used.
int32_t greedy_coloring(int64_t n, int64_t const *indptr,
                        int32_t const *indices, int32_t *colors) {
  std::vector<int32_t> used;
  int32_t num_colors = 0;
  std::fill(colors, colors + n, -1);
  for (int64_t i = 0; i < n; ++i) {
    used.assign(static_cast<size_t>(num_colors) + 1, 0);
    for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
      int32_t const j = indices[k];
      if (j == i) continue;
      int32_t const c = colors[j];
      if (c >= 0 && c < static_cast<int32_t>(used.size())) used[c] = 1;
    }
    int32_t c = 0;
    while (c < static_cast<int32_t>(used.size()) && used[c]) ++c;
    colors[i] = c;
    if (c + 1 > num_colors) num_colors = c + 1;
  }
  return num_colors;
}

namespace {

struct UnionFind {
  std::vector<int64_t> parent;
  std::vector<int32_t> rank_;
  std::vector<uint8_t> parity;  // sign relative to parent (0: same, 1: flip)

  explicit UnionFind(int64_t n) : parent(n), rank_(n, 0), parity(n, 0) {
    std::iota(parent.begin(), parent.end(), int64_t{0});
  }

  // find with path compression; returns root, sets *p to parity-to-root.
  int64_t find(int64_t i, uint8_t *p) {
    uint8_t acc = 0;
    int64_t root = i;
    while (parent[root] != root) {
      acc ^= parity[root];
      root = parent[root];
    }
    // second pass: compress
    int64_t cur = i;
    uint8_t cur_par = acc;
    while (parent[cur] != root) {
      int64_t const next = parent[cur];
      uint8_t const next_par = cur_par ^ parity[cur];
      parent[cur] = root;
      parity[cur] = cur_par;
      cur = next;
      cur_par = next_par;
    }
    *p = acc;
    return root;
  }
};

}  // namespace

// Deterministic greedy sign solver: process couplings by descending |J|,
// merging signed clusters with a parity union-find (O(E log E)); then a
// sequential local-flip polish until no single flip lowers the energy
// (the reference prototype's polish loop, common.py:417-434).
//
// Inputs: symmetric CSR (both triangles stored), field h.
// Output: signs (+-1) written to out_signs. Returns number of polish sweeps.
int64_t greedy_solve(int64_t n, int64_t const *indptr, int32_t const *indices,
                     double const *data, double const *field,
                     double *out_signs) {
  // collect upper-triangle edges
  struct Edge {
    double w;
    int64_t i;
    int64_t j;
  };
  std::vector<Edge> edges;
  edges.reserve(static_cast<size_t>(indptr[n]) / 2 + 1);
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
      int64_t const j = indices[k];
      if (j > i && data[k] != 0.0) edges.push_back({data[k], i, j});
    }
  }
  std::stable_sort(edges.begin(), edges.end(), [](Edge const &a, Edge const &b) {
    return std::abs(a.w) > std::abs(b.w);
  });

  UnionFind uf(n);
  for (Edge const &e : edges) {
    uint8_t pi, pj;
    int64_t const ri = uf.find(e.i, &pi);
    int64_t const rj = uf.find(e.j, &pj);
    if (ri == rj) continue;  // earlier (stronger) couplings fixed this pair
    // want s_i * s_j = -sign(w)  =>  parity_i ^ parity_j = (w > 0)
    uint8_t const want = e.w > 0.0 ? 1 : 0;
    uint8_t const link = pi ^ pj ^ want;
    if (uf.rank_[ri] < uf.rank_[rj]) {
      uf.parent[ri] = rj;
      uf.parity[ri] = link;
    } else if (uf.rank_[ri] > uf.rank_[rj]) {
      uf.parent[rj] = ri;
      uf.parity[rj] = link;
    } else {
      uf.parent[rj] = ri;
      uf.parity[rj] = link;
      uf.rank_[ri] += 1;
    }
  }
  for (int64_t i = 0; i < n; ++i) {
    uint8_t p;
    uf.find(i, &p);
    out_signs[i] = p ? -1.0 : 1.0;
  }

  // sequential local-flip polish: flip s_i when it strictly lowers energy,
  // i.e. when s_i * (2 * sum_j J_ij s_j + h_i) > 0.
  int64_t sweeps = 0;
  bool changed = true;
  while (changed) {
    changed = false;
    ++sweeps;
    for (int64_t i = 0; i < n; ++i) {
      double local = 0.0;
      for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
        int64_t const j = indices[k];
        if (j != i) local += data[k] * out_signs[j];
      }
      if (out_signs[i] * (2.0 * local + field[i]) > 0.0) {
        out_signs[i] = -out_signs[i];
        changed = true;
      }
    }
    if (sweeps > 1000) break;  // safety net on pathological inputs
  }
  return sweeps;
}

// Reference-quality sequential simulated annealing (single chain) — used in
// tests to cross-check the TPU color-parallel annealer's statistics, and as
// a CPU fallback when no accelerator is available.
int64_t anneal_chain(int64_t n, int64_t const *indptr, int32_t const *indices,
                     double const *data, double const *field,
                     double beta0, double beta1, int64_t number_sweeps,
                     uint64_t seed, double *signs /* in: x0, out: result */) {
  auto next_u64 = [state = seed ^ 0x9E3779B97F4A7C15ull]() mutable {
    // splitmix64
    state += 0x9E3779B97F4A7C15ull;
    uint64_t z = state;
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
  };
  auto uniform = [&]() {
    return static_cast<double>(next_u64() >> 11) * 0x1.0p-53;
  };

  int64_t accepted = 0;
  for (int64_t sweep = 0; sweep < number_sweeps; ++sweep) {
    double const t = number_sweeps > 1
                         ? static_cast<double>(sweep) / (number_sweeps - 1)
                         : 1.0;
    double const beta = beta0 * std::pow(beta1 / beta0, t);
    for (int64_t i = 0; i < n; ++i) {
      double local = 0.0;
      for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
        int64_t const j = indices[k];
        if (j != i) local += data[k] * signs[j];
      }
      double const delta = -2.0 * signs[i] * (2.0 * local + field[i]);
      if (delta <= 0.0 || uniform() < std::exp(-beta * delta)) {
        signs[i] = -signs[i];
        ++accepted;
      }
    }
  }
  return accepted;
}

}  // extern "C"
