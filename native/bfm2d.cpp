// Back-and-forth method (BFM) for the 2-D quadratic-Wasserstein distance.
//
// Fresh C++17 implementation of the same algorithm as the JAX solver in
// devito_fwi_tpu/misfit/bfm.py (which mirrors the reference's native
// solver, misfit/QW2D/src/fot2d.c — see SURVEY.md §2.3): H^-1 (DCT-space
// Poisson) gradient ascent on the Kantorovich dual, separable discrete
// Legendre transforms for the quadratic-cost c-transform, mass-conserving
// density pushforward with cell supersampling, and adaptive step control.
//
// Differences from the reference C (by design, not translation):
//   * DCT-II/III are orthonormal FFT-based transforms (radix-2 +
//     Bluestein for arbitrary lengths, OpenMP-parallel over lines) with
//     no external dependency — O(n log n) per line where the reference
//     links FFTW;
//   * the Legendre transform uses an O(n) monotone convex-hull sweep;
//   * the ABI is a shared library with a C API (ctypes-friendly) rather
//     than a file-driven subprocess binary; the `ctransform` and
//     `pushforward` entry points correspond to the reference's separate
//     `w2` Python extension module (misfit/bfm.py:1).
//
// Build: make -C native   (g++ -O3 -fopenmp -shared -fPIC)

#include <chrono>
#include <cmath>
#include <complex>
#include <cstdlib>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

using std::vector;
using cd = std::complex<double>;

// ---------------------------------------------------------------------------
// FFT engine: iterative radix-2 for power-of-two sizes, Bluestein chirp-z
// for arbitrary sizes. Used to evaluate the orthonormal DCT-II / DCT-III
//   X[k] = s_k sum_i x[i] cos(pi (i+.5) k / n),  s_0 = sqrt(1/n),
//   s_k = sqrt(2/n)  (inverse = transpose)
// through a length-2n DFT:
//   DCT2:  X[k] = s_k Re( e^{-i pi k/(2n)} DFT_{2n}(x padded)[k] )
//   DCT3:  y[i] = Re( conj(DFT_{2n}(conj(d)))[i] ),
//          d[k] = s_k X[k] e^{+i pi k/(2n)}, zero-padded
// ---------------------------------------------------------------------------

struct Cfft {                       // power-of-two, in-place, decimation
  int m = 0;
  vector<int> rev;
  vector<cd> tw;                    // twiddles e^{-2 pi i j / len} per stage

  void init(int m_) {
    m = m_;
    rev.assign(m, 0);
    int logm = 0;
    while ((1 << logm) < m) ++logm;
    for (int i = 0; i < m; ++i) {
      int r = 0;
      for (int b = 0; b < logm; ++b)
        if (i & (1 << b)) r |= 1 << (logm - 1 - b);
      rev[i] = r;
    }
    tw.assign(m, cd(0, 0));         // stage twiddles packed: tw[len/2 + j]
    for (int len = 2; len <= m; len <<= 1)
      for (int j = 0; j < len / 2; ++j)
        tw[len / 2 + j] = std::polar(1.0, -2.0 * M_PI * j / len);
  }

  void fwd(cd* a) const {           // e^{-i ...} convention
    for (int i = 0; i < m; ++i)
      if (rev[i] > i) std::swap(a[i], a[rev[i]]);
    for (int len = 2; len <= m; len <<= 1) {
      const cd* w = tw.data() + len / 2;
      for (int s = 0; s < m; s += len)
        for (int j = 0; j < len / 2; ++j) {
          cd u = a[s + j];
          cd v = a[s + j + len / 2] * w[j];
          a[s + j] = u + v;
          a[s + j + len / 2] = u - v;
        }
    }
  }

  void inv_unscaled(cd* a) const {  // conj-trick inverse, no 1/m scale
    for (int i = 0; i < m; ++i) a[i] = std::conj(a[i]);
    fwd(a);
    for (int i = 0; i < m; ++i) a[i] = std::conj(a[i]);
  }
};

// DFT of arbitrary length L (only the first `nkeep` outputs are used).
struct DftPlan {
  int L = 0, M = 0;
  bool pow2 = false;
  Cfft fft;                         // size L (pow2) or M (Bluestein)
  vector<cd> chirp;                 // w_j = e^{-i pi j^2 / L}, j < L
  vector<cd> Bf;                    // FFT_M(b), b = circular conj chirp

  void init(int L_) {
    L = L_;
    pow2 = (L & (L - 1)) == 0;
    if (pow2) {
      fft.init(L);
      return;
    }
    M = 1;
    while (M < 2 * L - 1) M <<= 1;
    fft.init(M);
    chirp.assign(L, cd(0, 0));
    for (int j = 0; j < L; ++j) {
      // j^2 mod 2L keeps the phase argument small
      long long q = (long long)j * j % (2LL * L);
      chirp[j] = std::polar(1.0, -M_PI * (double)q / L);
    }
    vector<cd> b(M, cd(0, 0));
    b[0] = std::conj(chirp[0]);
    for (int j = 1; j < L; ++j) {
      b[j] = std::conj(chirp[j]);
      b[M - j] = b[j];
    }
    fft.fwd(b.data());
    Bf = std::move(b);
  }

  size_t scratch_size() const { return pow2 ? (size_t)L : (size_t)M; }

  // in: L complex values (caller zero-pads); out: first nkeep bins.
  void run(cd* buf, cd* out, int nkeep) const {
    if (pow2) {
      fft.fwd(buf);
      std::memcpy(out, buf, sizeof(cd) * nkeep);
      return;
    }
    for (int j = 0; j < L; ++j) buf[j] *= chirp[j];
    std::memset(buf + L, 0, sizeof(cd) * (M - L));
    fft.fwd(buf);
    for (int j = 0; j < M; ++j) buf[j] *= Bf[j];
    fft.inv_unscaled(buf);
    double inv_m = 1.0 / M;
    for (int k = 0; k < nkeep; ++k) out[k] = buf[k] * chirp[k] * inv_m;
  }
};

struct DctAxis {                    // orthonormal DCT-II/III along length n
  // Makhoul even/odd packing: a real length-n DCT runs through ONE
  // length-n complex DFT. Forward: v[j] = x[2j], v[n-1-j] = x[2j+1],
  // V = DFT_n(v), c[k] = s_k Re(e^{-i pi k/(2n)} V[k]). Inverse (DCT-III
  // = transpose): yhat[k] = c[k]/s_k, V[0] = yhat[0],
  // V[k] = e^{+i pi k/(2n)} (yhat[k] - i yhat[n-k]), v = IDFT_n(V),
  // unpack. (V is Hermitian by construction, so v comes out real.)
  int n = 0;
  DftPlan dft;                      // length n
  vector<cd> e_fwd;                 // s_k e^{-i pi k / (2n)}
  vector<cd> e_inv;                 // e^{+i pi k / (2n)} (pure phase)
  vector<double> inv_s;             // 1 / s_k

  void init(int n_) {
    n = n_;
    dft.init(n);
    e_fwd.assign(n, cd(0, 0));
    e_inv.assign(n, cd(0, 0));
    inv_s.assign(n, 0.0);
    for (int k = 0; k < n; ++k) {
      double s = std::sqrt((k == 0 ? 1.0 : 2.0) / n);
      e_fwd[k] = std::polar(s, -M_PI * k / (2.0 * n));
      e_inv[k] = std::polar(1.0, +M_PI * k / (2.0 * n));
      inv_s[k] = 1.0 / s;
    }
  }

  size_t scratch_size() const { return dft.scratch_size() + (size_t)n; }

  void dct2(const double* x, double* y, cd* scratch) const {
    cd* buf = scratch;
    cd* out = scratch + dft.scratch_size();
    int half = (n + 1) / 2;
    for (int j = 0; j < half; ++j) buf[j] = cd(x[2 * j], 0.0);
    for (int j = 0; j < n / 2; ++j) buf[n - 1 - j] = cd(x[2 * j + 1], 0.0);
    dft.run(buf, out, n);
    for (int k = 0; k < n; ++k)
      y[k] = (e_fwd[k] * out[k]).real();
  }

  void dct3(const double* c, double* y, cd* scratch) const {
    cd* buf = scratch;
    cd* out = scratch + dft.scratch_size();
    // build V (Hermitian), then v = IDFT_n(V) via conj(DFT_n(conj(V)))/n
    buf[0] = cd(c[0] * inv_s[0], 0.0);
    for (int k = 1; k < n; ++k)
      buf[k] = e_inv[k] * cd(c[k] * inv_s[k], -c[n - k] * inv_s[n - k]);
    for (int k = 0; k < n; ++k) buf[k] = std::conj(buf[k]);
    dft.run(buf, out, n);
    double inv_n = 1.0 / n;
    int half = (n + 1) / 2;
    for (int j = 0; j < half; ++j)
      y[2 * j] = out[j].real() * inv_n;
    for (int j = 0; j < n / 2; ++j)
      y[2 * j + 1] = out[n - 1 - j].real() * inv_n;
  }
};

struct DctPlan {
  int n1 = 0, n2 = 0;               // row length (fast axis), rows
  DctAxis ax1, ax2;
  vector<double> tmp;               // (n2*n1) scratch

  void init(int n1_, int n2_) {
    n1 = n1_;
    n2 = n2_;
    ax1.init(n1);
    ax2.init(n2);
    tmp.assign((size_t)n1 * n2, 0.0);
  }

  // out = (C2 (x) C1) in  (forward, DCT-II) or transposes (inverse).
  void apply(const double* in, double* out, bool inverse) {
#ifdef _OPENMP
    int nthreads = omp_get_max_threads();
#else
    int nthreads = 1;
#endif
    size_t sc1 = ax1.scratch_size(), sc2 = ax2.scratch_size();
    size_t scn = (sc1 > sc2 ? sc1 : sc2);
    vector<cd> scratch((size_t)nthreads * scn);
    vector<double> cols((size_t)nthreads * 2 * n2);

    // rows (contiguous)
#pragma omp parallel for schedule(static)
    for (int i2 = 0; i2 < n2; ++i2) {
#ifdef _OPENMP
      cd* sc = scratch.data() + (size_t)omp_get_thread_num() * scn;
#else
      cd* sc = scratch.data();
#endif
      const double* row = in + (size_t)i2 * n1;
      double* trow = tmp.data() + (size_t)i2 * n1;
      if (!inverse) ax1.dct2(row, trow, sc);
      else ax1.dct3(row, trow, sc);
    }
    // columns (gather/scatter through a contiguous buffer)
#pragma omp parallel for schedule(static)
    for (int k1 = 0; k1 < n1; ++k1) {
#ifdef _OPENMP
      int tid = omp_get_thread_num();
#else
      int tid = 0;
#endif
      cd* sc = scratch.data() + (size_t)tid * scn;
      double* cbuf = cols.data() + (size_t)tid * 2 * n2;
      double* cout = cbuf + n2;
      for (int i2 = 0; i2 < n2; ++i2)
        cbuf[i2] = tmp[(size_t)i2 * n1 + k1];
      if (!inverse) ax2.dct2(cbuf, cout, sc);
      else ax2.dct3(cbuf, cout, sc);
      for (int k2 = 0; k2 < n2; ++k2)
        out[(size_t)k2 * n1 + k1] = cout[k2];
    }
  }
};

// ---------------------------------------------------------------------------
// Discrete Legendre transform along one axis:
//   out[i] = max_j (s[i] * s[j] - u[j]),   s[j] = (j + 0.5) / n.
// O(n): the maximizing j is on the lower convex hull of (s[j], u[j]) and
// moves monotonically with i (slopes s[i] are increasing).
// ---------------------------------------------------------------------------

void legendre_1d(const double* u, double* out, int n, const double* s,
                 int* hull /* scratch size n */) {
  int hn = 0;
  for (int j = 0; j < n; ++j) {
    // keep hull of points (s[j], u[j]) that are minimal for some slope:
    // pop while the new point makes the middle one non-extreme
    while (hn >= 2) {
      int a = hull[hn - 2], b = hull[hn - 1];
      // b is dominated if (u[j]-u[a])/(s[j]-s[a]) <= (u[b]-u[a])/(s[b]-s[a])
      double lhs = (u[j] - u[a]) * (s[b] - s[a]);
      double rhs = (u[b] - u[a]) * (s[j] - s[a]);
      if (lhs <= rhs) --hn; else break;
    }
    hull[hn++] = j;
  }
  int k = 0;
  for (int i = 0; i < n; ++i) {
    double slope = s[i];
    while (k + 1 < hn) {
      int a = hull[k], b = hull[k + 1];
      if (slope * s[b] - u[b] >= slope * s[a] - u[a]) ++k; else break;
    }
    int j = hull[k];
    out[i] = slope * s[j] - u[j];
  }
}

struct Workspace {
  int n1, n2;
  vector<double> sx, sy;        // cell-center coordinates
  vector<double> quad;          // .5(x^2+y^2)
  vector<double> kernel;        // negative-Laplace DCT kernel
  vector<double> a, b;          // scratch (n2*n1), (n1*n2)
  DctPlan dct;

  void init(int n1_, int n2_) {
    n1 = n1_; n2 = n2_;
    sx.resize(n1); sy.resize(n2);
    for (int i = 0; i < n1; ++i) sx[i] = (i + 0.5) / n1;
    for (int i = 0; i < n2; ++i) sy[i] = (i + 0.5) / n2;
    quad.resize((size_t)n1 * n2);
    for (int iy = 0; iy < n2; ++iy)
      for (int ix = 0; ix < n1; ++ix)
        quad[(size_t)iy * n1 + ix] =
            0.5 * (sx[ix] * sx[ix] + sy[iy] * sy[iy]);
    kernel.resize((size_t)n1 * n2);
    for (int iy = 0; iy < n2; ++iy)
      for (int ix = 0; ix < n1; ++ix) {
        double kx = 2.0 * n1 * n1 * (1.0 - std::cos(M_PI * ix / n1));
        double ky = 2.0 * n2 * n2 * (1.0 - std::cos(M_PI * iy / n2));
        kernel[(size_t)iy * n1 + ix] = (ix == 0 && iy == 0) ? 1.0 : kx + ky;
      }
    a.resize((size_t)n1 * n2);
    b.resize((size_t)n1 * n2);
    dct.init(n1, n2);
  }

  // 2-D c-transform for the quadratic cost (separable Legendre):
  // out[iy][ix] = max_{jx,jy}(sx[ix] sx[jx] + sy[iy] sy[jy] - u[jy][jx])
  void legendre_2d(const double* u, double* out) {
#pragma omp parallel
    {
      vector<int> hull(std::max(n1, n2));
#pragma omp for schedule(static)
      for (int iy = 0; iy < n2; ++iy)
        legendre_1d(u + (size_t)iy * n1, a.data() + (size_t)iy * n1, n1,
                    sx.data(), hull.data());
      // transpose a -> b (b is (n1 rows) x (n2 cols)), negated
#pragma omp for schedule(static)
      for (int ix = 0; ix < n1; ++ix)
        for (int iy = 0; iy < n2; ++iy)
          b[(size_t)ix * n2 + iy] = -a[(size_t)iy * n1 + ix];
#pragma omp for schedule(static)
      for (int ix = 0; ix < n1; ++ix)
        legendre_1d(b.data() + (size_t)ix * n2, a.data() + (size_t)ix * n2,
                    n2, sy.data(), hull.data());
      // transpose back
#pragma omp for schedule(static)
      for (int iy = 0; iy < n2; ++iy)
        for (int ix = 0; ix < n1; ++ix)
          out[(size_t)iy * n1 + ix] = a[(size_t)ix * n2 + iy];
    }
  }

  // bilinear interpolation with the clamped-extrapolation convention of
  // the JAX solver (bfm.py _interp_c); X, Y in [0, 1] map coordinates
  double interp(const double* f, double X, double Y) const {
    double xi = X * n1 - 0.5, yi = Y * n2 - 0.5;
    double xc = std::min(std::max(xi, 0.0), (double)(n1 - 1));
    double yc = std::min(std::max(yi, 0.0), (double)(n2 - 1));
    int xI = (int)std::floor(xc), yI = (int)std::floor(yc);
    double xf = X * n1 - xI - 0.5, yf = Y * n2 - yI - 0.5;
    int xO = std::min(std::max(xI + (xf > 0 ? 1 : (xf < 0 ? -1 : 0)), 0),
                      n1 - 1);
    int yO = std::min(std::max(yI + (yf > 0 ? 1 : (yf < 0 ? -1 : 0)), 0),
                      n2 - 1);
    double ax = std::fabs(xf), ay = std::fabs(yf);
    return (1 - ax) * (1 - ay) * f[(size_t)yI * n1 + xI] +
           ax * (1 - ay) * f[(size_t)yI * n1 + xO] +
           (1 - ax) * ay * f[(size_t)yO * n1 + xI] +
           ax * ay * f[(size_t)yO * n1 + xO];
  }

  // corner-grid transport map = central-difference gradient of `dual`
  void pushforward_map(const double* dual, vector<double>& xMap,
                       vector<double>& yMap) {
    int m1 = n1 + 1, m2 = n2 + 1;
    xMap.resize((size_t)m1 * m2);
    yMap.resize((size_t)m1 * m2);
    double xs = 1.0 / n1, ys = 1.0 / n2;
#pragma omp parallel for schedule(static)
    for (int iy = 0; iy < m2; ++iy) {
      double Y = (double)iy / n2;
      for (int ix = 0; ix < m1; ++ix) {
        double X = (double)ix / n1;
        xMap[(size_t)iy * m1 + ix] =
            0.5 * n1 * (interp(dual, X + xs, Y) - interp(dual, X - xs, Y));
        yMap[(size_t)iy * m1 + ix] =
            0.5 * n2 * (interp(dual, X, Y + ys) - interp(dual, X, Y - ys));
      }
    }
  }

  // mass-conserving pushforward of mu through the corner map, with nsub^2
  // supersampling per cell and the stretch-cutoff cell rejection
  void sampling_pushforward(const double* mu, const vector<double>& xMap,
                            const vector<double>& yMap, int nsub,
                            double* rho) {
    int m1 = n1 + 1;
    size_t pc = (size_t)n1 * n2;
    std::memset(rho, 0, pc * sizeof(double));
    double xCut = std::cbrt(1.0 / n1), yCut = std::cbrt(1.0 / n2);
    for (int iy = 0; iy < n2; ++iy) {
      for (int ix = 0; ix < n1; ++ix) {
        double m = mu[(size_t)iy * n1 + ix];
        if (m <= 0) continue;
        double c00x = xMap[(size_t)iy * m1 + ix];
        double c01x = xMap[(size_t)iy * m1 + ix + 1];
        double c10x = xMap[(size_t)(iy + 1) * m1 + ix];
        double c11x = xMap[(size_t)(iy + 1) * m1 + ix + 1];
        double c00y = yMap[(size_t)iy * m1 + ix];
        double c01y = yMap[(size_t)iy * m1 + ix + 1];
        double c10y = yMap[(size_t)(iy + 1) * m1 + ix];
        double c11y = yMap[(size_t)(iy + 1) * m1 + ix + 1];
        double xStretch = std::max(std::fabs(c01x - c00x),
                                   std::fabs(c11x - c10x));
        double yStretch = std::max(std::fabs(c10y - c00y),
                                   std::fabs(c11y - c01y));
        if (xStretch >= xCut || yStretch >= yCut) continue;
        // nsub > 0: fixed supersampling (jittable-JAX-compatible);
        // nsub <= 0: the reference's per-cell adaptive sample counts
        // (fot2d.c:405-406, truncating int conversion included)
        int xs = nsub > 0 ? nsub : (int)(2 * std::fmax(n1 * xStretch, 1.0));
        int ys = nsub > 0 ? nsub : (int)(2 * std::fmax(n2 * yStretch, 1.0));
        double mass = m / ((double)xs * ys);
        for (int l = 0; l < ys; ++l) {
          double bb = (l + 0.5) / ys;
          for (int k = 0; k < xs; ++k) {
            double aa = (k + 0.5) / xs;
            double xP = (1 - bb) * (1 - aa) * c00x + (1 - bb) * aa * c01x +
                        bb * (1 - aa) * c10x + aa * bb * c11x;
            double yP = (1 - bb) * (1 - aa) * c00y + (1 - bb) * aa * c01y +
                        bb * (1 - aa) * c10y + aa * bb * c11y;
            double X = xP * n1 - 0.5, Y = yP * n2 - 0.5;
            int xI = (int)std::floor(X), yI = (int)std::floor(Y);
            double xF = X - xI, yF = Y - yI;
            int xi = std::min(std::max(xI, 0), n1 - 1);
            int xo = std::min(std::max(xI + 1, 0), n1 - 1);
            int yi = std::min(std::max(yI, 0), n2 - 1);
            int yo = std::min(std::max(yI + 1, 0), n2 - 1);
            rho[(size_t)yi * n1 + xi] += (1 - xF) * (1 - yF) * mass;
            rho[(size_t)yo * n1 + xi] += (1 - xF) * yF * mass;
            rho[(size_t)yi * n1 + xo] += xF * (1 - yF) * mass;
            rho[(size_t)yo * n1 + xo] += xF * yF * mass;
          }
        }
      }
    }
    double total = 0.0;
    for (size_t i = 0; i < pc; ++i) total += rho[i];
    total /= pc;
    if (total > 0)
      for (size_t i = 0; i < pc; ++i) rho[i] /= total;
  }

  // H^-1 ascent step: w = idct2(dct2(rho - target)/kernel), phi += sigma w;
  // returns the H^1 residual sum(w (rho-target))/pcount
  double update_potential(double* phi, const double* rho,
                          const double* target, double sigma,
                          vector<double>& r, vector<double>& w) {
    size_t pc = (size_t)n1 * n2;
    r.resize(pc); w.resize(pc);
    for (size_t i = 0; i < pc; ++i) r[i] = rho[i] - target[i];
    dct.apply(r.data(), w.data(), false);
    for (size_t i = 0; i < pc; ++i) w[i] /= kernel[i];
    w[0] = 0.0;
    dct.apply(w.data(), r.data(), true);  // r now holds idct(w)
    double h1 = 0.0;
    for (size_t i = 0; i < pc; ++i) {
      double diff = rho[i] - target[i];
      h1 += r[i] * diff;
      phi[i] += sigma * r[i];
    }
    return h1 / pc;
  }

  double compute_w2(const double* phi, const double* dual, const double* mu,
                    const double* nu) const {
    size_t pc = (size_t)n1 * n2;
    double v = 0.0;
    for (size_t i = 0; i < pc; ++i)
      v += quad[i] * (mu[i] + nu[i]) - nu[i] * phi[i] - mu[i] * dual[i];
    return v / pc;
  }
};

double step_update(double sigma, double value, double old, double h1) {
  double diff = value - old;
  if (diff > h1 * sigma * 0.75) return sigma / 0.8;
  if (diff < h1 * sigma * 0.25) return sigma * 0.8;
  return sigma;
}

}  // namespace

extern "C" {

// Quadratic-Wasserstein distance + gradient d W2/d f of two same-shape 2-D
// densities (row-major, rows = n2, cols = n1). Mirrors bfm_jax/fotGradient2d:
// unit-mean normalization, alternating H^-1 ascent + convexification +
// pushforward, final grad = (psi - <mu, psi>/pcount)/mean(f).
// Returns 0 on success.
//
// `phases`, when non-null, receives the per-phase wall-clock breakdown
// the reference C solver prints with clock() (fot2d.c:530-534,599-602):
// [0] H^-1 updates, [1] Legendre/c-transforms, [2] pushforwards
// (map + sampling), [3] total.
static int bfm2d_gradient_impl(const float* f, const float* g, int n1,
                               int n2, int num_steps, float step_scale,
                               int nsub, float* grad, float* loss,
                               double* phases) {
  if (n1 < 2 || n2 < 2 || num_steps < 1 || nsub < 0) return 1;
  using clk = std::chrono::steady_clock;
  auto tick = clk::now;
  auto secs = [](clk::time_point a, clk::time_point b) {
    return std::chrono::duration<double>(b - a).count();
  };
  double t_upd = 0.0, t_leg = 0.0, t_push = 0.0;
  auto t_all0 = tick();
  size_t pc = (size_t)n1 * n2;
  Workspace ws;
  ws.init(n1, n2);

  vector<double> mu(pc), nu(pc);
  double sum1 = 0.0, sum2 = 0.0;
  for (size_t i = 0; i < pc; ++i) { sum1 += f[i]; sum2 += g[i]; }
  sum1 /= pc; sum2 /= pc;
  for (size_t i = 0; i < pc; ++i) {
    mu[i] = sum1 > 0 ? f[i] / sum1 : 0.0;
    nu[i] = sum2 > 0 ? g[i] / sum2 : 0.0;
  }
  double mx = 0.0;
  for (size_t i = 0; i < pc; ++i)
    mx = std::max(mx, std::max(mu[i], nu[i]));
  double sigma = mx > 0 ? step_scale / mx : (double)step_scale;

  vector<double> phi(ws.quad), dual(ws.quad), rho(mu);
  vector<double> xMap, yMap, r, w, tmp(pc);
  double old = ws.compute_w2(phi.data(), dual.data(), mu.data(), nu.data());
  double value = old;

  for (int it = 0; it < num_steps; ++it) {
    auto t0 = tick();
    double h1 = ws.update_potential(phi.data(), rho.data(), nu.data(),
                                    sigma, r, w);
    auto t1 = tick();
    t_upd += secs(t0, t1);
    ws.legendre_2d(phi.data(), dual.data());
    ws.legendre_2d(dual.data(), phi.data());
    auto t2 = tick();
    t_leg += secs(t1, t2);
    value = ws.compute_w2(phi.data(), dual.data(), mu.data(), nu.data());
    sigma = step_update(sigma, value, old, h1);
    old = value;
    auto t3 = tick();
    ws.pushforward_map(phi.data(), xMap, yMap);
    ws.sampling_pushforward(nu.data(), xMap, yMap, nsub, rho.data());
    auto t4 = tick();
    t_push += secs(t3, t4);

    h1 = ws.update_potential(dual.data(), rho.data(), mu.data(), sigma,
                             r, w);
    auto t5 = tick();
    t_upd += secs(t4, t5);
    ws.legendre_2d(dual.data(), phi.data());
    ws.legendre_2d(phi.data(), dual.data());
    auto t6 = tick();
    t_leg += secs(t5, t6);
    ws.pushforward_map(dual.data(), xMap, yMap);
    ws.sampling_pushforward(mu.data(), xMap, yMap, nsub, rho.data());
    auto t7 = tick();
    t_push += secs(t6, t7);
    value = ws.compute_w2(phi.data(), dual.data(), mu.data(), nu.data());
    sigma = step_update(sigma, value, old, h1);
    old = value;
  }

  double term = 0.0;
  for (size_t i = 0; i < pc; ++i) {
    tmp[i] = ws.quad[i] - dual[i];  // dual potential of f
    term += mu[i] * tmp[i];
  }
  term /= pc;
  for (size_t i = 0; i < pc; ++i)
    grad[i] = (float)(sum1 > 0 ? (tmp[i] - term) / sum1 : 0.0);
  *loss = (float)value;
  if (phases) {
    phases[0] = t_upd;
    phases[1] = t_leg;
    phases[2] = t_push;
    phases[3] = secs(t_all0, tick());
  }
  return 0;
}

int bfm2d_gradient(const float* f, const float* g, int n1, int n2,
                   int num_steps, float step_scale, int nsub, float* grad,
                   float* loss) {
  return bfm2d_gradient_impl(f, g, n1, n2, num_steps, step_scale, nsub,
                             grad, loss, nullptr);
}

// timed variant: `phases` receives [update, legendre, pushforward, total]
// seconds — the reference solver's 4-phase clock breakdown as data
// instead of stdout.
int bfm2d_gradient_timed(const float* f, const float* g, int n1, int n2,
                         int num_steps, float step_scale, int nsub,
                         float* grad, float* loss, double* phases) {
  return bfm2d_gradient_impl(f, g, n1, n2, num_steps, step_scale, nsub,
                             grad, loss, phases);
}

// c-transform for the quadratic cost (double Legendre = convexification):
// out = (u*)* with u* the separable discrete Legendre transform. This is
// the native equivalent of the reference's `w2` extension `ctransform`.
int bfm2d_ctransform(const float* u, int n1, int n2, float* out) {
  if (n1 < 2 || n2 < 2) return 1;
  size_t pc = (size_t)n1 * n2;
  Workspace ws;
  ws.init(n1, n2);
  vector<double> ud(pc), od(pc);
  for (size_t i = 0; i < pc; ++i) ud[i] = u[i];
  ws.legendre_2d(ud.data(), od.data());
  for (size_t i = 0; i < pc; ++i) out[i] = (float)od[i];
  return 0;
}

// density pushforward through the gradient map of `dual` (native equivalent
// of the `w2` extension `pushforward`).
int bfm2d_pushforward(const float* mu, const float* dual, int n1, int n2,
                      int nsub, float* rho) {
  if (n1 < 2 || n2 < 2 || nsub < 0) return 1;
  size_t pc = (size_t)n1 * n2;
  Workspace ws;
  ws.init(n1, n2);
  vector<double> mud(pc), duald(pc), rhod(pc), xMap, yMap;
  for (size_t i = 0; i < pc; ++i) { mud[i] = mu[i]; duald[i] = dual[i]; }
  ws.pushforward_map(duald.data(), xMap, yMap);
  ws.sampling_pushforward(mud.data(), xMap, yMap, nsub, rhod.data());
  for (size_t i = 0; i < pc; ++i) rho[i] = (float)rhod[i];
  return 0;
}

// batch variant over independent (f, g) pairs — the native analog of the
// reference's MPI mpibfm2d shot-parallel binary, with OpenMP tasks
// replacing MPI ranks.
int bfm2d_gradient_batch(const float* f, const float* g, int nbatch, int n1,
                         int n2, int num_steps, float step_scale, int nsub,
                         float* grad, float* loss) {
  int rc = 0;
#pragma omp parallel for schedule(dynamic)
  for (int b = 0; b < nbatch; ++b) {
    size_t off = (size_t)b * n1 * n2;
    int r = bfm2d_gradient(f + off, g + off, n1, n2, num_steps, step_scale,
                           nsub, grad + off, loss + b);
#pragma omp atomic
    rc |= r;
  }
  return rc;
}

}  // extern "C"
