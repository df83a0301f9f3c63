// Jonker-Volgenant shortest-augmenting-path LAP solver (rectangular).
//
// Native host-side counterpart of tpupose/ops/lap.py: used by the numpy
// oracle tracker and CLI host paths where scipy would otherwise be the
// bottleneck at high stream counts. Same semantics as
// scipy.optimize.linear_sum_assignment: minimize total cost, assign every
// row (requires rows <= cols; callers transpose otherwise).
#include <cfloat>
#include <cstdint>
#include <vector>

extern "C" {

// cost: row-major (n_rows x n_cols), n_rows <= n_cols.
// col_of_row: out, size n_rows.
// returns 0 on success, -1 on bad arguments.
int tpupose_solve_lap(const float* cost, int32_t n_rows, int32_t n_cols,
                      int32_t* col_of_row) {
  if (n_rows <= 0 || n_cols <= 0 || n_rows > n_cols) return -1;
  const int R = n_rows, C = n_cols;
  std::vector<double> u(R + 1, 0.0), v(C + 1, 0.0);
  std::vector<int32_t> p(C + 1, -1);   // col -> row, C is the virtual column
  std::vector<int32_t> way(C + 1, C);
  std::vector<double> minv(C + 1);
  std::vector<char> used(C + 1);

  for (int i = 0; i < R; ++i) {
    p[C] = i;
    int j0 = C;
    std::fill(minv.begin(), minv.end(), DBL_MAX);
    std::fill(used.begin(), used.end(), 0);
    do {
      used[j0] = 1;
      const int i0 = p[j0];
      double delta = DBL_MAX;
      int j1 = -1;
      const float* row = cost + static_cast<int64_t>(i0) * C;
      for (int j = 0; j < C; ++j) {
        if (used[j]) continue;
        const double cur = row[j] - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      for (int j = 0; j <= C; ++j) {
        if (used[j]) {
          u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != -1);
    // augment
    do {
      const int j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0 != C);
  }

  for (int i = 0; i < R; ++i) col_of_row[i] = -1;
  for (int j = 0; j < C; ++j) {
    if (p[j] >= 0) col_of_row[p[j]] = j;
  }
  return 0;
}

}  // extern "C"
