// Dantzig-style principal-pivoting solver for the boxed LCP with
// friction-index coupling — the native host-side oracle/reference solver.
//
// Capability parity with the reference's vendored ODE solver
// (dart/external/odelcpsolver/lcp.cpp, dSolveLCP — SURVEY.md §2.1): exact
// pivot-accuracy solutions used to validate the batched on-device solvers.
// Clean-room implementation of the classic drive-to-zero algorithm
// (Cottle–Dantzig principal pivoting, boxed variant):
//
//   maintain index sets  C  (free: w_j = 0, lo_j < x_j < hi_j),
//                        NL (x_j = lo_j, w_j >= 0),
//                        NH (x_j = hi_j, w_j <= 0);
//   introduce one index at a time and drive its w to zero (or its x to a
//   bound) along the constrained direction obtained from the C-subsystem.
//
// Friction rows (findex[i] >= 0) have moving bounds +-mu_i * x[findex[i]].
// Coupled bounds break the pivoting invariants if tracked inside the drive
// loop, so the solver STAGGERS: each outer pass freezes the friction bounds
// at the previous pass's normal impulses and runs an exact boxed-Dantzig
// solve; passes repeat to the coupled fixed point (typically 2-4 passes).
//
// Build:  g++ -O3 -shared -fPIC -o libdantzig.so lcp_dantzig.cpp
// API  :  extern "C" int boxed_lcp_dantzig(...)   (see bottom)

#include <cmath>
#include <cstring>
#include <vector>

namespace {

constexpr double kTol = 1e-10;
constexpr int kMaxPivots = 10000;

enum Set : int { UNPROCESSED = 0, SET_C = 1, SET_NL = 2, SET_NH = 3 };

struct Workspace {
  int n;
  const double* A;  // row-major n x n
  std::vector<double> x, w, lo, hi;  // lo/hi FROZEN within a pass
  std::vector<int> state;
  const double* b;

  double a(int i, int j) const { return A[i * n + j]; }
};

void recompute_w(Workspace& W) {
  for (int i = 0; i < W.n; ++i) {
    double s = W.b[i];
    for (int j = 0; j < W.n; ++j) s += W.a(i, j) * W.x[j];
    W.w[i] = s;
  }
}

// Solve A_CC d_C = -A_C,i  by dense Gaussian elimination with partial
// pivoting (oracle-grade robustness; |C| is small).
bool solve_subsystem(const Workspace& W, const std::vector<int>& C, int i,
                     std::vector<double>& d) {
  int m = (int)C.size();
  d.assign(m, 0.0);
  if (m == 0) return true;
  std::vector<double> M(m * m), rhs(m);
  for (int r = 0; r < m; ++r) {
    for (int c = 0; c < m; ++c) M[r * m + c] = W.a(C[r], C[c]);
    rhs[r] = -W.a(C[r], i);
  }
  // gaussian elimination, partial pivoting
  std::vector<int> piv(m);
  for (int k = 0; k < m; ++k) piv[k] = k;
  for (int k = 0; k < m; ++k) {
    int best = k;
    double bv = std::fabs(M[piv[k] * m + k]);
    for (int r = k + 1; r < m; ++r) {
      double v = std::fabs(M[piv[r] * m + k]);
      if (v > bv) { bv = v; best = r; }
    }
    if (bv < 1e-14) return false;
    std::swap(piv[k], piv[best]);
    double diag = M[piv[k] * m + k];
    for (int r = k + 1; r < m; ++r) {
      double f = M[piv[r] * m + k] / diag;
      if (f == 0.0) continue;
      for (int c = k; c < m; ++c) M[piv[r] * m + c] -= f * M[piv[k] * m + c];
      rhs[piv[r]] -= f * rhs[piv[k]];
    }
  }
  for (int k = m - 1; k >= 0; --k) {
    double s = rhs[piv[k]];
    for (int c = k + 1; c < m; ++c) s -= M[piv[k] * m + c] * d[c];
    d[k] = s / M[piv[k] * m + k];
  }
  return true;
}

int drive_to_zero(Workspace& W, int i) {
  int n = W.n;
  for (int pivot = 0; pivot < kMaxPivots; ++pivot) {
    recompute_w(W);
    double wi = W.w[i];
    if (std::fabs(wi) <= kTol) {  // done: park in C (or at a touching bound)
      W.state[i] = SET_C;
      return 0;
    }
    double dir = (wi < 0) ? +1.0 : -1.0;  // increase x_i to raise w_i

    // current C set
    std::vector<int> C;
    C.reserve(n);
    for (int j = 0; j < n; ++j)
      if (W.state[j] == SET_C) C.push_back(j);

    std::vector<double> d;
    if (!solve_subsystem(W, C, i, d)) return 2;

    // delta-w per unit x_i for all rows: aj = A_j,i + sum_C A_j,Ck d_k
    std::vector<double> dw(n);
    for (int j = 0; j < n; ++j) {
      double s = W.a(j, i);
      for (size_t k = 0; k < C.size(); ++k) s += W.a(j, C[k]) * d[k];
      dw[j] = s;
    }

    // largest step s >= 0 with x_i += dir*s, x_C += dir*d*s, w += dir*dw*s
    double step = 1e30;
    int limit_idx = -1, limit_kind = 0;  // 1: wi->0, 2: xi->bound, 3: C->bound, 4: N->free
    double ai = dw[i];
    if (dir * ai > kTol) {  // w_i moves toward zero
      double s1 = -wi / (dir * ai);
      if (s1 < step) { step = s1; limit_idx = i; limit_kind = 1; }
    }
    {
      double s2 = (dir > 0) ? (W.hi[i] - W.x[i]) : (W.x[i] - W.lo[i]);
      if (s2 < step) { step = s2; limit_idx = i; limit_kind = 2; }
    }
    for (size_t k = 0; k < C.size(); ++k) {
      int j = C[k];
      double dx = dir * d[k];
      if (dx > kTol) {
        double s3 = (W.hi[j] - W.x[j]) / dx;
        if (s3 < step) { step = s3; limit_idx = j; limit_kind = 3; }
      } else if (dx < -kTol) {
        double s3 = (W.lo[j] - W.x[j]) / dx;
        if (s3 < step) { step = s3; limit_idx = j; limit_kind = 3; }
      }
    }
    for (int j = 0; j < n; ++j) {
      if (W.state[j] != SET_NL && W.state[j] != SET_NH) continue;
      double dwj = dir * dw[j];
      bool leaves = (W.state[j] == SET_NL && dwj < -kTol) ||
                    (W.state[j] == SET_NH && dwj > kTol);
      if (leaves) {
        double s4 = -W.w[j] / dwj;
        if (s4 >= -kTol && s4 < step) { step = std::max(s4, 0.0); limit_idx = j; limit_kind = 4; }
      }
    }

    if (limit_idx < 0 || step >= 1e29) return 3;  // unbounded ray: shouldn't happen (PSD + box)
    if (step < 0) step = 0;

    // apply
    W.x[i] += dir * step;
    for (size_t k = 0; k < C.size(); ++k) W.x[C[k]] += dir * d[k] * step;

    switch (limit_kind) {
      case 1: W.state[i] = SET_C; return 0;
      case 2: W.state[i] = (dir > 0) ? SET_NH : SET_NL;
              W.x[i] = (dir > 0) ? W.hi[i] : W.lo[i];
              return 0;
      case 3: {
        // a C row hit its bound: move it out of C
        double dx = 0;
        for (size_t k = 0; k < C.size(); ++k) if (C[k] == limit_idx) dx = dir * d[k];
        W.state[limit_idx] = (dx > 0) ? SET_NH : SET_NL;
        W.x[limit_idx] = (dx > 0) ? W.hi[limit_idx] : W.lo[limit_idx];
        break;
      }
      case 4: W.state[limit_idx] = SET_C; break;
    }
  }
  return 4;  // pivot limit
}

// one exact boxed-Dantzig solve with frozen bounds (x starts from zero)
int solve_frozen(Workspace& W) {
  int rc = 0;
  for (int i = 0; i < W.n; ++i) {
    if (W.hi[i] - W.lo[i] < kTol) {
      W.x[i] = 0.5 * (W.lo[i] + W.hi[i]);
      W.state[i] = SET_NL;
      continue;
    }
    int r = drive_to_zero(W, i);
    if (r != 0) rc = r;
  }
  return rc;
}

// projected Gauss-Seidel with continuously updated friction bounds: cheap
// warm start that lands near the coupled fixed point, from which the exact
// staggered passes converge.
void pgs_warmstart(int n, const double* A, const double* b, const double* lo,
                   const double* hi, const double* mu, const int* findex,
                   std::vector<double>& x, int sweeps) {
  x.assign(n, 0.0);
  for (int it = 0; it < sweeps; ++it) {
    for (int i = 0; i < n; ++i) {
      double diag = A[i * n + i];
      if (diag < 1e-14) continue;
      double w = b[i];
      for (int j = 0; j < n; ++j) w += A[i * n + j] * x[j];
      double cand = x[i] - w / diag;
      double l = lo[i], h = hi[i];
      if (findex[i] >= 0) {
        double m = mu[i] * std::fabs(x[findex[i]]);
        l = -m; h = +m;
      }
      if (cand < l) cand = l;
      if (cand > h) cand = h;
      x[i] = cand;
    }
  }
}

}  // namespace

extern "C" {

// Solve the boxed LCP:  w = A x + b,  lo(x) <= x <= hi(x),
//   x=lo => w>=0, x=hi => w<=0, interior => w=0;
// friction rows (findex[i]>=0) have lo/hi = -+ mu[i]*x[findex[i]].
// A row-major (n*n). Outputs x (n) and w (n). Returns 0 on success.
int boxed_lcp_dantzig(int n, const double* A, const double* b,
                      const double* lo, const double* hi, const double* mu,
                      const int* findex, double* x_out, double* w_out) {
  std::vector<double> x_prev, x_best(n, 0.0);
  pgs_warmstart(n, A, b, lo, hi, mu, findex, x_prev, 400);
  double best_res = 1e300;
  {
    // the warm start itself is a candidate best iterate
    Workspace W0; W0.n = n; W0.A = A; W0.b = b; W0.x = x_prev;
    W0.w.assign(n, 0.0); recompute_w(W0);
    double res = 0.0;
    for (int i = 0; i < n; ++i) {
      double l = lo[i], h = hi[i];
      if (findex[i] >= 0) { double m = mu[i] * std::fabs(W0.x[findex[i]]); l = -m; h = +m; }
      double proj = W0.x[i] - W0.w[i];
      if (proj < l) proj = l;
      if (proj > h) proj = h;
      res = std::max(res, std::fabs(W0.x[i] - proj));
    }
    best_res = res; x_best = x_prev;
  }
  Workspace W;
  int rc = 0;
  constexpr int kOuter = 25;
  for (int outer = 0; outer < kOuter; ++outer) {
    W.n = n;
    W.A = A;
    W.b = b;
    W.x.assign(n, 0.0);
    W.w.assign(n, 0.0);
    W.lo.assign(lo, lo + n);
    W.hi.assign(hi, hi + n);
    // freeze friction bounds at the previous pass's normal impulses
    for (int i = 0; i < n; ++i) {
      if (findex[i] >= 0) {
        double m = mu[i] * std::fabs(x_prev[findex[i]]);
        W.lo[i] = -m;
        W.hi[i] = +m;
      }
    }
    W.state.assign(n, UNPROCESSED);
    rc = solve_frozen(W);
    // natural-map residual of the COUPLED problem at this iterate
    recompute_w(W);
    double res = 0.0;
    for (int i = 0; i < n; ++i) {
      double l = lo[i], h = hi[i];
      if (findex[i] >= 0) {
        double m = mu[i] * std::fabs(W.x[findex[i]]);
        l = -m; h = +m;
      }
      double proj = W.x[i] - W.w[i];
      if (proj < l) proj = l;
      if (proj > h) proj = h;
      res = std::max(res, std::fabs(W.x[i] - proj));
    }
    if (res < best_res) { best_res = res; x_best = W.x; }
    double delta = 0.0;
    for (int i = 0; i < n; ++i) delta = std::max(delta, std::fabs(W.x[i] - x_prev[i]));
    // staggering: full bound updates first; damp after 8 passes to
    // stabilize oscillating coupled fixed points (possible for
    // non-contact-structured A)
    double alpha = (outer < 8) ? 1.0 : 0.5;
    for (int i = 0; i < n; ++i) x_prev[i] = (1 - alpha) * x_prev[i] + alpha * W.x[i];
    if (delta < 1e-11 || best_res < 1e-12) break;
  }
  // report the best iterate under the coupled residual
  W.x = x_best;
  recompute_w(W);
  std::memcpy(x_out, W.x.data(), n * sizeof(double));
  std::memcpy(w_out, W.w.data(), n * sizeof(double));
  return (best_res < 1e-7) ? rc : 5;
}

}  // extern "C"
