// CELT decode hot loops (PVQ codeword enumeration, spreading
// rotations, the pitch post-filter comb) as a C ABI — the native
// counterpart of gstreamer_tpu/codecs/celt.py (same arithmetic,
// bit-exact; the Python path remains the specification).
//
// Built by gstreamer_tpu/native/_build.py (no external deps).

#include <cstdint>
#include <cstring>
#include <cmath>

namespace {

// U(n,k) memo (cwrs.c row recurrence).  Codebook sizes V(N,K) are
// bounded below 2^32 by the allocation (bands split until the
// codebook fits the range coder), so uint64 cannot overflow here.
constexpr int UN = 300, UK = 160;
static uint64_t u_tab[UN][UK];
static bool u_set[UN][UK];

uint64_t U(int64_t n, int64_t k) {
    if (k <= 0) return (k == 0 && n == 0) ? 1 : 0;
    if (n <= 0) return 0;
    if (n < k) { int64_t t = n; n = k; k = t; }
    if (k == 1) return 1;
    if (n < UN && k < UK && u_set[n][k]) return u_tab[n][k];
    uint64_t v = U(n - 1, k) + U(n, k - 1) + U(n - 1, k - 1);
    if (n < UN && k < UK) { u_tab[n][k] = v; u_set[n][k] = true; }
    return v;
}

}  // namespace

extern "C" {

uint64_t gtpu_celt_pvq_v(int n, int k) {
    if (k == 0) return 1;
    return U(n, k) + U(n, k + 1);
}

// Index -> pulse vector (cwrs.c cwrsi), y has n entries.
void gtpu_celt_cwrsi(int n, int k, uint64_t i, int32_t *y) {
    int pos = 0;
    while (n > 2) {
        if (k >= n) {
            uint64_t p = U(n, k + 1);
            int s = i >= p;
            if (s) i -= p;
            int k0 = k;
            uint64_t q = U(n, n);
            if (q > i) {
                k = n;
                do { k--; p = U(k, n); } while (p > i);
            } else {
                p = U(n, k);
                while (p > i) { k--; p = U(n, k); }
            }
            i -= p;
            int val = k0 - k;
            y[pos++] = s ? -val : val;
        } else {
            uint64_t p = U(k, n);
            uint64_t q = U(k + 1, n);
            if (p <= i && i < q) {
                i -= p;
                y[pos++] = 0;
            } else {
                int s = i >= q;
                if (s) i -= q;
                int k0 = k;
                do { k--; p = U(k, n); } while (p > i);
                i -= p;
                int val = k0 - k;
                y[pos++] = s ? -val : val;
            }
        }
        n--;
    }
    // n == 2
    {
        uint64_t p = 2 * (uint64_t)k + 1;
        int s = i >= p;
        if (s) i -= p;
        int k0 = k;
        k = (int)((i + 1) >> 1);
        if (k) i -= 2 * (uint64_t)k - 1;
        int val = k0 - k;
        y[pos++] = s ? -val : val;
    }
    // n == 1
    y[pos++] = i ? -k : k;
}

// exp_rotation1 (bands.c): two sweeps of a Givens-like rotation.
static void rot1(double *X, int length, int stride, double c,
                 double s) {
    double ms = -s;
    for (int i = 0; i < length - stride; i++) {
        double x1 = X[i], x2 = X[i + stride];
        X[i + stride] = c * x2 + s * x1;
        X[i] = c * x1 + ms * x2;
    }
    for (int i = length - 2 * stride - 1; i >= 0; i--) {
        double x1 = X[i], x2 = X[i + stride];
        X[i + stride] = c * x2 + s * x1;
        X[i] = c * x1 + ms * x2;
    }
}

void gtpu_celt_exp_rotation(double *X, int n, int direction,
                            int stride, int K, int factor) {
    // caller guarantees 2*K < n and spread != none; factor is
    // SPREAD_FACTOR[spread-1]
    double gain = 1.0 * n / (n + (double)factor * K);
    double theta = 0.5 * gain * gain;
    double c = cos(0.5 * M_PI * theta);
    double s = cos(0.5 * M_PI * (1.0 - theta));
    int stride2 = 0;
    if (n >= 8 * stride) {
        stride2 = 1;
        while ((stride2 * stride2 + stride2) * stride
               + (stride >> 2) < n)
            stride2++;
    }
    int length = n / stride;
    for (int i = 0; i < stride; i++) {
        double *seg = X + i * length;
        if (direction < 0) {
            if (stride2) rot1(seg, length, stride2, s, c);
            rot1(seg, length, 1, c, s);
        } else {
            rot1(seg, length, 1, c, -s);
            if (stride2) rot1(seg, length, stride2, s, -c);
        }
    }
}

// celt.c comb_filter, in place on buf[off:off+N]; window2 holds the
// per-sample squared window for the crossfade region.
void gtpu_celt_comb_filter(double *buf, int off, int T0, int T1,
                           int N, double g0, double g1,
                           const double *gains0,
                           const double *gains1,
                           const double *window2, int overlap,
                           int minperiod) {
    if (g0 == 0.0 && g1 == 0.0) return;
    double g00 = g0 * gains0[0], g01 = g0 * gains0[1],
           g02 = g0 * gains0[2];
    double g10 = g1 * gains1[0], g11 = g1 * gains1[1],
           g12 = g1 * gains1[2];
    if (T0 < minperiod) T0 = minperiod;
    if (T1 < minperiod) T1 = minperiod;
    int ov = overlap < N ? overlap : N;
    for (int i = 0; i < ov; i++) {
        int p = off + i;
        double f = window2[i];
        buf[p] = buf[p]
            + (1 - f) * (g00 * buf[p - T0]
                         + g01 * (buf[p - T0 + 1] + buf[p - T0 - 1])
                         + g02 * (buf[p - T0 + 2] + buf[p - T0 - 2]))
            + f * (g10 * buf[p - T1]
                   + g11 * (buf[p - T1 + 1] + buf[p - T1 - 1])
                   + g12 * (buf[p - T1 + 2] + buf[p - T1 - 2]));
    }
    if (g1 == 0.0) return;
    for (int i = ov; i < N; i++) {
        int p = off + i;
        buf[p] += g10 * buf[p - T1]
            + g11 * (buf[p - T1 + 1] + buf[p - T1 - 1])
            + g12 * (buf[p - T1 + 2] + buf[p - T1 - 2]);
    }
}

}  // extern "C"
