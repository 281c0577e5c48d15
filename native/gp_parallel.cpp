// OpenMP-threaded C++ exact-GP baseline — the parallel-CPU tier of the
// speedup ladder (SURVEY.md section 2, C12). The reference compares its
// CUDA pipeline against CPU baselines; this is the multicore denominator:
// the same double-precision pipeline as gp_serial.cpp with the O(N^2)
// covariance build and the O(N^3) Cholesky panel/trailing loops
// parallelized across cores.
//
// Exposed through a C ABI (gpp_*) for ctypes (cugp_tpu/oracle/native.py).

#include <omp.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kLog2Pi = 1.8378770664093453;

double kernel_value(double d2, int32_t kind) {
  switch (kind) {
    case 0:  // rbf
      return std::exp(-0.5 * d2);
    case 1: {  // matern12
      const double r = std::sqrt(d2);
      return std::exp(-r);
    }
    case 2: {  // matern32
      const double s = std::sqrt(3.0 * d2);
      return (1.0 + s) * std::exp(-s);
    }
    case 3: {  // matern52
      const double s = std::sqrt(5.0 * d2);
      return (1.0 + s + s * s / 3.0) * std::exp(-s);
    }
  }
  return 0.0;
}

double sqdist(const double* a, const double* b, const double* inv_ell,
              int64_t d) {
  double acc = 0.0;
  for (int64_t k = 0; k < d; ++k) {
    const double t = (a[k] - b[k]) * inv_ell[k];
    acc += t * t;
  }
  return acc;
}

// Blocked right-looking Cholesky; the diagonal-panel factorization is
// sequential (tiny), the panel solve and trailing update — where all the
// FLOPs are — run parallel over rows.
int64_t cholesky_blocked_omp(double* a, int64_t n, int64_t nb = 96) {
  for (int64_t k = 0; k < n; k += nb) {
    const int64_t kb = std::min(nb, n - k);
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
#pragma omp parallel for schedule(static)
    for (int64_t i = k + kb; i < n; ++i) {
      for (int64_t j = k; j < k + kb; ++j) {
        double v = a[i * n + j];
        for (int64_t t = k; t < j; ++t) v -= a[i * n + t] * a[j * n + t];
        a[i * n + j] = v / a[j * n + j];
      }
    }
#pragma omp parallel for schedule(dynamic, 16)
    for (int64_t i = k + kb; i < n; ++i) {
      for (int64_t j = k + kb; j <= i; ++j) {
        double acc = 0.0;
        for (int64_t t = k; t < k + kb; ++t)
          acc += a[i * n + t] * a[j * n + t];
        a[i * n + j] -= acc;
      }
    }
  }
#pragma omp parallel for schedule(static)
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

int32_t gpp_num_threads() { return omp_get_max_threads(); }

void gpp_covariance(const double* x, int64_t n, int64_t d,
                    const double* log_ell, double log_sf2, double log_sn2,
                    double jitter, int32_t kind, double* k_out) {
  std::vector<double> inv_ell(d);
  for (int64_t t = 0; t < d; ++t) inv_ell[t] = std::exp(-log_ell[t]);
  const double sf2 = std::exp(log_sf2);
  const double diag_add = std::exp(log_sn2) + jitter * sf2;
#pragma omp parallel for schedule(dynamic, 16)
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = 0; j <= i; ++j) {
      const double d2 = sqdist(x + i * d, x + j * d, inv_ell.data(), d);
      const double v = sf2 * kernel_value(d2, kind);
      k_out[i * n + j] = v;
      k_out[j * n + i] = v;
    }
    k_out[i * n + i] += diag_add;
  }
}

int64_t gpp_cholesky(double* a, int64_t n) {
  return cholesky_blocked_omp(a, n);
}

double gpp_lml(const double* x, const double* y, int64_t n, int64_t d,
               const double* log_ell, double log_sf2, double log_sn2,
               double jitter, int32_t kind, double* alpha_out, double* l_out,
               int64_t* status_out) {
  std::vector<double> k(static_cast<size_t>(n) * n);
  gpp_covariance(x, n, d, log_ell, log_sf2, log_sn2, jitter, kind, k.data());
  const int64_t status = cholesky_blocked_omp(k.data(), n);
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

}  // extern "C"
