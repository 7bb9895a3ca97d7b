// SILK fixed-point synthesis hot loops (decode_core, LPC analysis
// filter, the IIR+FIR resampler and stereo unmix) as a C ABI — the
// native counterpart of gstreamer_tpu/codecs/silk.py's Python
// implementation (same RFC 6716 §4.2.8 arithmetic, bit-exact: the
// Python path remains the executable specification and the parity
// oracle).
//
// Built by gstreamer_tpu/native/_build.py (no external deps).

#include <cstdint>
#include <cstring>

namespace {

inline int32_t SAT16(int64_t x) {
    return x < -32768 ? -32768 : (x > 32767 ? 32767 : (int32_t)x);
}
inline int32_t SAT32(int64_t x) {
    const int64_t lo = -(1LL << 31), hi = (1LL << 31) - 1;
    return (int32_t)(x < lo ? lo : (x > hi ? hi : x));
}
inline int32_t W32(int64_t x) { return (int32_t)(uint32_t)x; }
inline int32_t SMULWB(int32_t a, int32_t b) {
    return (int32_t)(((int64_t)a * (int16_t)b) >> 16);
}
inline int32_t SMULWW(int32_t a, int32_t b) {
    return (int32_t)(((int64_t)a * b) >> 16);
}
inline int32_t SMLAWB(int32_t a, int32_t b, int32_t c) {
    return W32((int64_t)a + SMULWB(b, c));
}
inline int32_t SMULBB(int32_t a, int32_t b) {
    return (int32_t)((int16_t)a * (int16_t)b);
}
inline int32_t RSHIFT_ROUND(int64_t a, int n) {
    return (int32_t)(n == 1 ? (a >> 1) + (a & 1)
                            : ((a >> (n - 1)) + 1) >> 1);
}
inline int32_t RAND(int32_t seed) {
    return W32(907633515 + (int64_t)W32((int64_t)seed * 196314165));
}
inline int CLZ32(uint32_t x) {
    return x ? __builtin_clz(x) : 32;
}

int32_t INVERSE32_varQ(int32_t b32, int q_res) {
    int head = CLZ32((uint32_t)(b32 < 0 ? -(int64_t)b32 : b32)) - 1;
    int32_t nrm = W32((int64_t)b32 << head);
    int32_t inv = (int32_t)((0x7FFFFFFF >> 2) / (nrm >> 16));
    int32_t res = W32((int64_t)inv << 16);
    int32_t err = W32(((int64_t)((1 << 29) - SMULWB(nrm, inv))) << 3);
    res = W32((int64_t)res + (((int64_t)err * inv) >> 16));
    int lshift = 61 - head - q_res;
    if (lshift <= 0) return SAT32((int64_t)res << (-lshift));
    if (lshift < 32) return res >> lshift;
    return 0;
}

int32_t SMMUL(int32_t a, int32_t b) {
    return (int32_t)(((int64_t)a * b) >> 32);
}

int32_t DIV32_varQ(int32_t a32, int32_t b32, int q_res) {
    int ah = CLZ32((uint32_t)(a32 < 0 ? -(int64_t)a32 : a32)) - 1;
    int32_t anrm = W32((int64_t)a32 << ah);
    int bh = CLZ32((uint32_t)(b32 < 0 ? -(int64_t)b32 : b32)) - 1;
    int32_t bnrm = W32((int64_t)b32 << bh);
    int32_t binv = (int32_t)((0x7FFFFFFF >> 2) / (bnrm >> 16));
    int32_t res = SMULWB(anrm, binv);
    anrm = W32((int64_t)anrm - W32((int64_t)W32((int64_t)SMMUL(bnrm, res) << 3)));
    res = SMLAWB(res, anrm, binv);
    int lshift = 29 + ah - bh - q_res;
    if (lshift < 0) return SAT32((int64_t)res << (-lshift));
    if (lshift < 32) return res >> lshift;
    return 0;
}

}  // namespace

extern "C" {

// LPC analysis (whitening) FIR: out[0:order]=0;
// out[i] = SAT16(RSHIFT_ROUND((in[i]<<12) - sum in[i-1-j]*b[j], 12))
void gtpu_silk_lpc_analysis(const int32_t *in, const int32_t *b_q12,
                            int length, int order, int32_t *out) {
    for (int i = 0; i < order && i < length; i++) out[i] = 0;
    for (int i = order; i < length; i++) {
        int32_t acc = 0;
        for (int j = 0; j < order; j++)
            acc = W32((int64_t)acc + SMULBB(in[i - 1 - j], b_q12[j]));
        acc = W32(((int64_t)in[i] << 12) - acc);
        out[i] = SAT16(RSHIFT_ROUND(acc, 12));
    }
}

// decode_core for one frame (mono channel state).  All buffers are
// int32 arrays owned by the caller:
//   pulses[frame_length]           excitation magnitudes (signed)
//   exc_q14[frame_length]          out: scaled excitation
//   s_lpc[16]                      i/o: LPC filter state (Q14)
//   out_buf[ltp_mem + 2*subfr]     i/o: output history (updated by
//                                  the caller after synthesis)
//   gains_q16[nb_subfr], pred_coef_q12[2*16], ltp_coef_q14[nb*5],
//   pitch_lags[nb_subfr]
//   xq[frame_length]               out: synthesized int16 samples
// Returns the updated prev_gain_q16.
int32_t gtpu_silk_decode_core(
    const int32_t *pulses, int frame_length, int subfr_length,
    int nb_subfr, int ltp_mem_length, int lpc_order,
    int signal_type, int quant_offset, int seed, int nlsf_interp_q2,
    const int32_t *gains_q16, const int32_t *pred_coef_q12,
    const int32_t *ltp_coef_q14, const int32_t *pitch_lags,
    int32_t ltp_scale_q14, int32_t prev_gain_q16,
    int32_t offset_q10,
    int32_t *exc_q14, int32_t *s_lpc, int32_t *out_buf,
    int32_t *xq_scratch /* >= ltp_mem+frame int32 */,
    int32_t *xq) {
    int32_t *xq_base = xq;

    // excitation with LCG sign scrambling
    int32_t rs = (int32_t)seed;
    for (int i = 0; i < frame_length; i++) {
        rs = RAND(rs);
        int64_t v = (int64_t)pulses[i] << 14;
        if (v > 0) v -= 80 << 4;
        else if (v < 0) v += 80 << 4;
        v += (int64_t)offset_q10 << 4;
        if (rs < 0) v = -v;
        exc_q14[i] = (int32_t)v;
        rs = W32((int64_t)rs + pulses[i]);
    }

    // sLTP_Q15 scratch lives in xq_scratch
    int32_t *s_ltp_q15 = xq_scratch;
    static thread_local int32_t s_ltp16[4096];
    int interp_flag = nlsf_interp_q2 < 4 ? 1 : 0;
    int ltp_buf_idx = ltp_mem_length;
    int32_t slpc[336];  // 16 + max subfr 320
    memcpy(slpc, s_lpc, 16 * sizeof(int32_t));

    const int32_t *pexc = exc_q14;
    int32_t *pxq = xq;
    int32_t pres_buf[320];

    for (int k = 0; k < nb_subfr; k++) {
        const int32_t *a_q12 = pred_coef_q12 + (k >> 1) * 16;
        const int32_t *b_q14 = ltp_coef_q14 + k * 5;
        int32_t gain_q10 = gains_q16[k] >> 6;
        int32_t inv_gain_q31 = INVERSE32_varQ(gains_q16[k], 47);
        int32_t gain_adj_q16 = 1 << 16;
        if (gains_q16[k] != prev_gain_q16) {
            gain_adj_q16 = DIV32_varQ(prev_gain_q16, gains_q16[k], 16);
            for (int i = 0; i < 16; i++)
                slpc[i] = SMULWW(gain_adj_q16, slpc[i]);
        }
        prev_gain_q16 = gains_q16[k];

        int lag = pitch_lags[k];
        if (signal_type == 2) {  // TYPE_VOICED
            if (k == 0 || (k == 2 && interp_flag)) {
                int start_idx = ltp_mem_length - lag - lpc_order - 2;
                if (k == 2)   // rewhitening window reaches into the
                    // first half of the current frame (decode_core.c)
                    memcpy(out_buf + ltp_mem_length, xq_base,
                           2 * subfr_length * sizeof(int32_t));
                gtpu_silk_lpc_analysis(
                    out_buf + start_idx + k * subfr_length, a_q12,
                    ltp_mem_length - start_idx, lpc_order, s_ltp16);
                int32_t ig = inv_gain_q31;
                if (k == 0)
                    ig = W32((int64_t)SMULWB(inv_gain_q31,
                                             ltp_scale_q14) << 2);
                inv_gain_q31 = ig;
                for (int i = 0; i < lag + 2; i++)
                    s_ltp_q15[ltp_buf_idx - i - 1] = SMULWB(
                        ig, s_ltp16[ltp_mem_length - start_idx
                                    - i - 1]);
            } else if (gain_adj_q16 != (1 << 16)) {
                for (int i = 0; i < lag + 2; i++)
                    s_ltp_q15[ltp_buf_idx - i - 1] = SMULWW(
                        gain_adj_q16, s_ltp_q15[ltp_buf_idx - i - 1]);
            }
        }

        const int32_t *pres;
        if (signal_type == 2) {
            int plag = ltp_buf_idx - lag + 2;
            for (int i = 0; i < subfr_length; i++) {
                int32_t pred = 2;
                pred = SMLAWB(pred, s_ltp_q15[plag - 0], b_q14[0]);
                pred = SMLAWB(pred, s_ltp_q15[plag - 1], b_q14[1]);
                pred = SMLAWB(pred, s_ltp_q15[plag - 2], b_q14[2]);
                pred = SMLAWB(pred, s_ltp_q15[plag - 3], b_q14[3]);
                pred = SMLAWB(pred, s_ltp_q15[plag - 4], b_q14[4]);
                plag++;
                pres_buf[i] = SAT32((int64_t)pexc[i]
                                    + W32((int64_t)pred << 1));
                s_ltp_q15[ltp_buf_idx] = W32((int64_t)pres_buf[i]
                                             << 1);
                ltp_buf_idx++;
            }
            pres = pres_buf;
        } else {
            pres = pexc;
        }

        for (int i = 0; i < subfr_length; i++) {
            int32_t pred = lpc_order >> 1;
            const int32_t *sl = slpc + 16 + i;
            for (int j = 0; j < lpc_order; j++)
                pred = SMLAWB(pred, sl[-1 - j], a_q12[j]);
            int32_t v = SAT32((int64_t)pres[i]
                              + SAT32((int64_t)pred << 4));
            slpc[16 + i] = v;
            xq[i] = SAT16(RSHIFT_ROUND(
                (int64_t)SMULWW(v, gain_q10), 8));
        }
        memmove(slpc, slpc + subfr_length, 16 * sizeof(int32_t));
        pexc += subfr_length;
        xq += subfr_length;
    }
    memcpy(s_lpc, slpc, 16 * sizeof(int32_t));
    return prev_gain_q16;
}

// IIR+FIR resampler: 2x all-pass upsample + 12-phase fractional FIR.
// s_iir: 6 int32; buf: caller scratch >= 8 + 2*n_in int32 holding
// s_fir(8) at entry, s_fir updated on exit.  Returns output count.
int gtpu_silk_resample_iirfir(
    int32_t *s_iir, int32_t *s_fir, const int16_t *frac_fir /*12*4*/,
    const int32_t *hq0, const int32_t *hq1, int32_t inv_ratio_q16,
    const int32_t *in, int n_in, int32_t *scratch, int32_t *out) {
    int32_t *buf = scratch;
    for (int i = 0; i < 8; i++) buf[i] = s_fir[i];
    for (int k = 0; k < n_in; k++) {
        int32_t in32 = W32((int64_t)in[k] << 10);
        int32_t y, x, o1, o2;
        y = W32((int64_t)in32 - s_iir[0]);
        x = SMULWB(y, hq0[0]);
        o1 = W32((int64_t)s_iir[0] + x);
        s_iir[0] = W32((int64_t)in32 + x);
        y = W32((int64_t)o1 - s_iir[1]);
        x = SMULWB(y, hq0[1]);
        o2 = W32((int64_t)s_iir[1] + x);
        s_iir[1] = W32((int64_t)o1 + x);
        y = W32((int64_t)o2 - s_iir[2]);
        x = SMLAWB(y, y, hq0[2]);
        o1 = W32((int64_t)s_iir[2] + x);
        s_iir[2] = W32((int64_t)o2 + x);
        buf[8 + 2 * k] = SAT16(RSHIFT_ROUND(o1, 10));
        y = W32((int64_t)in32 - s_iir[3]);
        x = SMULWB(y, hq1[0]);
        o1 = W32((int64_t)s_iir[3] + x);
        s_iir[3] = W32((int64_t)in32 + x);
        y = W32((int64_t)o1 - s_iir[4]);
        x = SMULWB(y, hq1[1]);
        o2 = W32((int64_t)s_iir[4] + x);
        s_iir[4] = W32((int64_t)o1 + x);
        y = W32((int64_t)o2 - s_iir[5]);
        x = SMLAWB(y, y, hq1[2]);
        o1 = W32((int64_t)s_iir[5] + x);
        s_iir[5] = W32((int64_t)o2 + x);
        buf[8 + 2 * k + 1] = SAT16(RSHIFT_ROUND(o1, 10));
    }
    int n2 = 2 * n_in;
    for (int i = 0; i < 8; i++) s_fir[i] = buf[n2 + i];
    int n_out = 0;
    int64_t max_idx = (int64_t)n_in << 17;
    for (int64_t idx = 0; idx < max_idx; idx += inv_ratio_q16) {
        int ti = (int)(((idx & 0xFFFF) * 12) >> 16);
        const int32_t *p = buf + (idx >> 16);
        const int16_t *a = frac_fir + ti * 4;
        const int16_t *b = frac_fir + (11 - ti) * 4;
        int64_t acc = (int64_t)p[0] * a[0] + (int64_t)p[1] * a[1]
                    + (int64_t)p[2] * a[2] + (int64_t)p[3] * a[3]
                    + (int64_t)p[4] * b[3] + (int64_t)p[5] * b[2]
                    + (int64_t)p[6] * b[1] + (int64_t)p[7] * b[0];
        out[n_out++] = SAT16(RSHIFT_ROUND(W32(acc), 15));
    }
    return n_out;
}


// ---- NLSF -> LPC (NLSF2A.c + LPC_fit.c + LPC_inv_pred_gain.c) ----

static void nlsf2a_find_poly(const int32_t *clsf, int dd,
                             int64_t *out) {
    out[0] = 1 << 16;
    out[1] = -(int64_t)clsf[0];
    for (int k = 1; k < dd; k++) {
        int64_t ftmp = clsf[k];
        out[k + 1] = W32(((int64_t)W32(out[k - 1]) << 1)
                         - RSHIFT_ROUND(ftmp * W32(out[k]), 16));
        for (int n = k; n > 1; n--)
            out[n] = W32((int64_t)W32(out[n]) + W32(out[n - 2])
                         - RSHIFT_ROUND(ftmp * W32(out[n - 1]), 16));
        out[1] -= ftmp;
    }
}

static void bwexpander_32(int32_t *ar, int d, int32_t chirp_q16) {
    int32_t cm1 = chirp_q16 - 65536;
    for (int i = 0; i < d - 1; i++) {
        ar[i] = SMULWW(chirp_q16, ar[i]);
        chirp_q16 += RSHIFT_ROUND((int64_t)chirp_q16 * cm1, 16);
    }
    ar[d - 1] = SMULWW(chirp_q16, ar[d - 1]);
}

static int64_t cdiv64(int64_t a, int64_t b) {
    int64_t q = (a < 0 ? -a : a) / (b < 0 ? -b : b);
    return ((a < 0) != (b < 0)) ? -q : q;
}

static void lpc_fit(int32_t *a_qa, int d, int32_t *a_q12) {
    const int qin = 17, qout = 12;
    int it;
    for (it = 0; it < 10; it++) {
        int64_t maxabs = -1;
        int idx = 0;
        for (int k = 0; k < d; k++) {
            int64_t v = a_qa[k] < 0 ? -(int64_t)a_qa[k] : a_qa[k];
            if (v > maxabs) { maxabs = v; idx = k; }
        }
        maxabs = (maxabs + (1 << (qin - qout - 1))) >> (qin - qout);
        if (maxabs > 32767) {
            if (maxabs > 163838) maxabs = 163838;
            int32_t chirp = (int32_t)(65536 - cdiv64(
                (maxabs - 32767) << 14,
                ((int64_t)maxabs * (idx + 1)) >> 2));
            bwexpander_32(a_qa, d, chirp);
        } else {
            break;
        }
    }
    if (it == 10) {
        for (int k = 0; k < d; k++) {
            a_q12[k] = SAT16(RSHIFT_ROUND(a_qa[k], qin - qout));
            a_qa[k] = a_q12[k] << (qin - qout);
        }
    } else {
        for (int k = 0; k < d; k++)
            a_q12[k] = RSHIFT_ROUND(a_qa[k], qin - qout);
    }
}

static int32_t SUB_SAT32(int64_t a, int64_t b) { return SAT32(a - b); }

static int32_t lpc_inverse_pred_gain(const int32_t *a_q12, int order) {
    const int QA = 24;
    const int32_t A_LIMIT = 16773022;
    int64_t a[24];
    int64_t dc = 0;
    for (int k = 0; k < order; k++) {
        dc += a_q12[k];
        a[k] = (int64_t)a_q12[k] << (QA - 12);
    }
    if (dc >= 4096) return 0;
    int64_t inv_gain = 1 << 30;
    for (int k = order - 1; k > 0; k--) {
        if (a[k] > A_LIMIT || a[k] < -A_LIMIT) return 0;
        int32_t rc = W32(-(a[k] << (31 - QA)));
        int32_t mult1 = W32((1LL << 30) - SMMUL(rc, rc));
        inv_gain = W32((int64_t)SMMUL((int32_t)inv_gain, mult1) << 2);
        if (inv_gain < 107374) return 0;
        uint32_t am = mult1 < 0 ? (uint32_t)(-mult1) : (uint32_t)mult1;
        int mult2q = 32 - CLZ32(am);
        int32_t mult2 = INVERSE32_varQ(mult1, mult2q + 30);
        for (int n = 0; n < (k + 1) >> 1; n++) {
            int64_t t1 = a[n];
            int64_t t2 = a[k - n - 1];
            int64_t v = RSHIFT_ROUND(
                (int64_t)SUB_SAT32(t1, RSHIFT_ROUND(t2 * rc, 31))
                * mult2, mult2q);
            if (v > 0x7FFFFFFFLL || v < -0x80000000LL) return 0;
            a[n] = v;
            v = RSHIFT_ROUND(
                (int64_t)SUB_SAT32(t2, RSHIFT_ROUND(t1 * rc, 31))
                * mult2, mult2q);
            if (v > 0x7FFFFFFFLL || v < -0x80000000LL) return 0;
            a[k - n - 1] = v;
        }
    }
    if (a[0] > A_LIMIT || a[0] < -A_LIMIT) return 0;
    int32_t rc = W32(-(a[0] << (31 - QA)));
    int32_t mult1 = W32((1LL << 30) - SMMUL(rc, rc));
    inv_gain = W32((int64_t)SMMUL((int32_t)inv_gain, mult1) << 2);
    if (inv_gain < 107374) return 0;
    return (int32_t)inv_gain;
}

// nlsf (Q15, d entries) -> a_q12[d]; cos table + ordering passed in.
void gtpu_silk_nlsf2a(const int32_t *nlsf, int d,
                      const int32_t *cos_tab /*129*/,
                      const int32_t *ordering,
                      int32_t *a_q12) {
    int32_t clsf[24];
    for (int k = 0; k < d; k++) {
        int fi = nlsf[k] >> 8;
        int ff = nlsf[k] - (fi << 8);
        clsf[ordering[k]] = RSHIFT_ROUND(
            ((int64_t)cos_tab[fi] << 8)
            + (int64_t)(cos_tab[fi + 1] - cos_tab[fi]) * ff, 4);
    }
    int dd = d >> 1;
    int64_t p[14], q[14];
    int32_t ce[12], co[12];
    for (int k = 0; k < dd; k++) { ce[k] = clsf[2 * k];
                                   co[k] = clsf[2 * k + 1]; }
    nlsf2a_find_poly(ce, dd, p);
    nlsf2a_find_poly(co, dd, q);
    int32_t a_qa[24];
    for (int k = 0; k < dd; k++) {
        int64_t pt = W32(p[k + 1]) + (int64_t)W32(p[k]);
        int64_t qt = W32(q[k + 1]) - (int64_t)W32(q[k]);
        a_qa[k] = W32(-qt - pt);
        a_qa[d - k - 1] = W32(qt - pt);
    }
    lpc_fit(a_qa, d, a_q12);
    for (int i = 0;
         lpc_inverse_pred_gain(a_q12, d) == 0 && i < 16; i++) {
        bwexpander_32(a_qa, d, 65536 - (2 << i));
        for (int k = 0; k < d; k++)
            a_q12[k] = RSHIFT_ROUND(a_qa[k], 17 - 12);
    }
}

}  // extern "C"
