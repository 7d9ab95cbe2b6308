// Batched assignment solvers for permutation recovery.
//
// Native counterpart of jpdvt_mt_ntnu_tpu/ops/assignment.py:
//  - jn_greedy_batch: exact port of the reference's greedy column scan
//    (reference image_model/inference.py:113-125 semantics: for each
//    canonical slot, pick the remaining piece with minimal distance,
//    first index on ties) followed by argsort -> pred.
//  - jn_hungarian_batch: O(n^3) Hungarian (potentials / shortest
//    augmenting path), the optimal-assignment upgrade. Replaces the
//    per-matrix scipy Python loop on the host path.
//
// C ABI, float32 row-major dist[b][n][n]; out_pred[b][n] gives the slot
// assigned to each piece (same convention as assignment.greedy_permutation).

#include <algorithm>
#include <cstdint>
#include <limits>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

void greedy_one(const float* dist, int n, int32_t* pred) {
  std::vector<double> d(dist, dist + n * n);
  std::vector<int32_t> order(n);
  for (int col = 0; col < n; ++col) {
    int best = 0;
    double best_v = kInf;
    for (int row = 0; row < n; ++row) {
      double v = d[row * n + col];
      if (v < best_v) {  // strict: first index wins ties, like argmin
        best_v = v;
        best = row;
      }
    }
    order[col] = best;
    for (int j = 0; j < n; ++j) d[best * n + j] = 1e9;
  }
  // pred = argsort(order): pred[piece] = slot
  for (int col = 0; col < n; ++col) pred[order[col]] = col;
}

void hungarian_one(const float* a, int n, int32_t* pred) {
  // Classic O(n^3) Hungarian with potentials (1-indexed internals).
  std::vector<double> u(n + 1, 0.0), v(n + 1, 0.0);
  std::vector<int> p(n + 1, 0), way(n + 1, 0);
  for (int i = 1; i <= n; ++i) {
    p[0] = i;
    int j0 = 0;
    std::vector<double> minv(n + 1, kInf);
    std::vector<char> used(n + 1, 0);
    do {
      used[j0] = 1;
      int i0 = p[j0], j1 = -1;
      double delta = kInf;
      for (int j = 1; j <= n; ++j) {
        if (used[j]) continue;
        double cur = static_cast<double>(a[(i0 - 1) * n + (j - 1)]) - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      for (int j = 0; j <= n; ++j) {
        if (used[j]) {
          u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != 0);
    do {
      int j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0);
  }
  for (int j = 1; j <= n; ++j)
    if (p[j]) pred[p[j] - 1] = j - 1;
}

}  // namespace

extern "C" {

void jn_greedy_batch(const float* dist, int batch, int n, int32_t* out_pred) {
  for (int b = 0; b < batch; ++b)
    greedy_one(dist + static_cast<long>(b) * n * n, n, out_pred + static_cast<long>(b) * n);
}

void jn_hungarian_batch(const float* dist, int batch, int n, int32_t* out_pred) {
  for (int b = 0; b < batch; ++b)
    hungarian_one(dist + static_cast<long>(b) * n * n, n, out_pred + static_cast<long>(b) * n);
}

}  // extern "C"
