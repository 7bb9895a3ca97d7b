// Native FLAC codec core — mirrors gstreamer_tpu/codecs/flac.py
// (the Python gold) exactly; tests assert bit-identical streams and
// sample-identical decodes. Clean-room implementation of RFC 9639.
//
// Exported C ABI:
//   gtpu_flac_decode(data, len, out_i32, max_samples, *nch, *rate,
//                    *bps) -> samples decoded (per channel), <0 error
//   gtpu_flac_encode(samples_i32 (n*ch interleaved), n, ch, rate,
//                    bps, blocksize, out, outcap) -> bytes, <0 error

#include <cstdint>
#include <cstring>
#include <cstdlib>

namespace {

// ---------------------------------------------------------------- CRCs
uint8_t crc8_tab[256];
uint16_t crc16_tab[256];
bool tabs_init = false;

void init_tabs() {
    if (tabs_init) return;
    for (int i = 0; i < 256; i++) {
        uint8_t c = (uint8_t)i;
        for (int k = 0; k < 8; k++)
            c = (c & 0x80) ? (uint8_t)((c << 1) ^ 0x07)
                           : (uint8_t)(c << 1);
        crc8_tab[i] = c;
        uint16_t w = (uint16_t)(i << 8);
        for (int k = 0; k < 8; k++)
            w = (w & 0x8000) ? (uint16_t)((w << 1) ^ 0x8005)
                             : (uint16_t)(w << 1);
        crc16_tab[i] = w;
    }
    tabs_init = true;
}

uint8_t crc8(const uint8_t* d, size_t n) {
    uint8_t c = 0;
    for (size_t i = 0; i < n; i++) c = crc8_tab[c ^ d[i]];
    return c;
}

uint16_t crc16(const uint8_t* d, size_t n) {
    uint16_t c = 0;
    for (size_t i = 0; i < n; i++)
        c = (uint16_t)(crc16_tab[((c >> 8) ^ d[i]) & 0xFF]
                       ^ (uint16_t)(c << 8));
    return c;
}

// ---------------------------------------------------------------- bit IO
struct BitReader {
    const uint8_t* data;
    size_t len;        // bytes
    size_t pos;        // bits
    bool fail = false;

    uint64_t read(int n) {
        if (pos + (size_t)n > len * 8) { fail = true; return 0; }
        uint64_t v = 0;
        while (n > 0) {
            uint8_t byte = data[pos >> 3];
            int avail = 8 - (int)(pos & 7);
            int take = avail < n ? avail : n;
            int shift = avail - take;
            v = (v << take) | ((byte >> shift) & ((1u << take) - 1));
            pos += take;
            n -= take;
        }
        return v;
    }
    int64_t read_signed(int n) {
        uint64_t v = read(n);
        if (n > 0 && (v >> (n - 1)) & 1)
            return (int64_t)v - ((int64_t)1 << n);
        return (int64_t)v;
    }
    uint32_t read_unary() {
        uint32_t q = 0;
        for (;;) {
            if (pos >= len * 8) { fail = true; return 0; }
            uint8_t byte = data[pos >> 3];
            int rem = 8 - (int)(pos & 7);
            uint8_t window = byte & ((1u << rem) - 1);
            if (window == 0) { q += rem; pos += rem; continue; }
            int bl = 31 - __builtin_clz((unsigned)window) + 1;
            int lead = rem - bl;
            q += lead;
            pos += lead + 1;
            return q;
        }
    }
    void align() { pos = (pos + 7) & ~(size_t)7; }
};

struct BitWriter {
    uint8_t* out;
    size_t cap;
    size_t nbytes = 0;
    uint64_t acc = 0;
    int nbits = 0;
    bool fail = false;

    void write(uint64_t v, int n) {
        if (n <= 0) return;
        acc = (acc << n) | (v & (n >= 64 ? ~0ULL : ((1ULL << n) - 1)));
        nbits += n;
        while (nbits >= 8) {
            nbits -= 8;
            if (nbytes >= cap) { fail = true; return; }
            out[nbytes++] = (uint8_t)((acc >> nbits) & 0xFF);
        }
        acc &= (nbits >= 64) ? ~0ULL : ((1ULL << nbits) - 1);
    }
    void write_unary(uint32_t q) {
        while (q >= 32) { write(0, 32); q -= 32; }
        write(1, q + 1);
    }
    void align() { if (nbits) write(0, 8 - nbits); }
};

const int FIXED_COEFFS[5][4] = {
    {0, 0, 0, 0}, {1, 0, 0, 0}, {2, -1, 0, 0},
    {3, -3, 1, 0}, {4, -6, 4, -1}};

// ---------------------------------------------------------------- decode
int utf8_read(BitReader& br, uint64_t* out) {
    uint32_t b0 = (uint32_t)br.read(8);
    if (b0 < 0x80) { *out = b0; return 0; }
    int n;
    uint64_t v;
    if ((b0 & 0xE0) == 0xC0)      { v = b0 & 0x1F; n = 1; }
    else if ((b0 & 0xF0) == 0xE0) { v = b0 & 0x0F; n = 2; }
    else if ((b0 & 0xF8) == 0xF0) { v = b0 & 0x07; n = 3; }
    else if ((b0 & 0xFC) == 0xF8) { v = b0 & 0x03; n = 4; }
    else if ((b0 & 0xFE) == 0xFC) { v = b0 & 0x01; n = 5; }
    else if (b0 == 0xFE)          { v = 0;         n = 6; }
    else return -1;
    for (int i = 0; i < n; i++) {
        uint32_t b = (uint32_t)br.read(8);
        if ((b & 0xC0) != 0x80) return -1;
        v = (v << 6) | (b & 0x3F);
    }
    *out = v;
    return 0;
}

int decode_residual(BitReader& br, int blocksize, int order,
                    int64_t* res) {
    int method = (int)br.read(2);
    if (method > 1) return -1;
    int plen = method == 0 ? 4 : 5;
    uint32_t escape = (1u << plen) - 1;
    int po = (int)br.read(4);
    int npart = 1 << po;
    if (blocksize % npart) return -1;
    int idx = 0;
    for (int p = 0; p < npart; p++) {
        int n = blocksize / npart - (p == 0 ? order : 0);
        uint32_t param = (uint32_t)br.read(plen);
        if (param == escape) {
            int raw = (int)br.read(5);
            for (int i = 0; i < n; i++)
                res[idx + i] = raw ? br.read_signed(raw) : 0;
        } else {
            for (int i = 0; i < n; i++) {
                uint64_t q = br.read_unary();
                uint64_t v = (q << param)
                    | (param ? br.read((int)param) : 0);
                res[idx + i] = (int64_t)(v >> 1) ^ -(int64_t)(v & 1);
            }
        }
        idx += n;
    }
    return br.fail ? -1 : 0;
}

int decode_subframe(BitReader& br, int blocksize, int bps,
                    int64_t* out, int64_t* scratch) {
    if (br.read(1)) return -1;
    int stype = (int)br.read(6);
    int wasted = 0;
    if (br.read(1)) {
        wasted = 1;
        while (br.read(1) == 0) {
            if (br.fail) return -1;
            wasted++;
        }
    }
    bps -= wasted;
    if (stype == 0) {
        int64_t v = br.read_signed(bps);
        for (int i = 0; i < blocksize; i++) out[i] = v;
    } else if (stype == 1) {
        for (int i = 0; i < blocksize; i++)
            out[i] = br.read_signed(bps);
    } else if (stype >= 8 && stype <= 12) {
        int order = stype - 8;
        for (int i = 0; i < order; i++) out[i] = br.read_signed(bps);
        if (decode_residual(br, blocksize, order, scratch)) return -1;
        const int* c = FIXED_COEFFS[order];
        for (int n = order; n < blocksize; n++) {
            int64_t acc = scratch[n - order];
            for (int i = 0; i < order; i++)
                acc += (int64_t)c[i] * out[n - 1 - i];
            out[n] = acc;
        }
    } else if (stype >= 32) {
        int order = stype - 31;
        for (int i = 0; i < order; i++) out[i] = br.read_signed(bps);
        int prec = (int)br.read(4) + 1;
        if (prec == 16) return -1;
        int shift = (int)br.read_signed(5);
        int64_t coefs[32];
        for (int i = 0; i < order; i++)
            coefs[i] = br.read_signed(prec);
        if (decode_residual(br, blocksize, order, scratch)) return -1;
        for (int n = order; n < blocksize; n++) {
            int64_t acc = 0;
            for (int i = 0; i < order; i++)
                acc += coefs[i] * out[n - 1 - i];
            out[n] = scratch[n - order] + (acc >> shift);
        }
    } else {
        return -1;
    }
    if (wasted)
        for (int i = 0; i < blocksize; i++) out[i] <<= wasted;
    return br.fail ? -1 : 0;
}

}  // namespace

extern "C" {

// Parses STREAMINFO + all frames; out must hold
// total_samples * channels int32.
long gtpu_flac_decode(const uint8_t* data, long len, int32_t* out,
                      long max_samples, int* out_ch, int* out_rate,
                      int* out_bps) {
    init_tabs();
    if (len < 8 || memcmp(data, "fLaC", 4) != 0) return -1;
    size_t pos = 4;
    int channels = 0, bps = 0, rate = 0;
    uint64_t total = 0;
    bool have_si = false;
    for (;;) {
        if (pos + 4 > (size_t)len) return -1;
        int last = data[pos] & 0x80;
        int btype = data[pos] & 0x7F;
        size_t size = ((size_t)data[pos + 1] << 16)
            | ((size_t)data[pos + 2] << 8) | data[pos + 3];
        if (btype == 0 && size >= 34) {
            BitReader br{data + pos + 4, size, 0};
            br.read(16); br.read(16); br.read(24); br.read(24);
            rate = (int)br.read(20);
            channels = (int)br.read(3) + 1;
            bps = (int)br.read(5) + 1;
            total = br.read(36);
            have_si = true;
        }
        pos += 4 + size;
        if (last) break;
    }
    if (!have_si || channels < 1 || channels > 8) return -1;
    *out_ch = channels;
    *out_rate = rate;
    *out_bps = bps;

    int64_t* chan[8];
    int64_t* scratch = (int64_t*)malloc(sizeof(int64_t) * 65536 * 9);
    if (!scratch) return -1;
    for (int c = 0; c < 8; c++) chan[c] = scratch + 65536 * (c + 1);

    long done = 0;
    while (pos + 2 < (size_t)len && (total == 0
                                     || (uint64_t)done < total)) {
        BitReader br{data, (size_t)len, pos * 8};
        size_t start = pos;
        if (br.read(14) != 0x3FFE) break;
        if (br.read(1)) { free(scratch); return -2; }
        br.read(1);
        int bs_code = (int)br.read(4);
        int sr_code = (int)br.read(4);
        int ch_code = (int)br.read(4);
        int bps_code = (int)br.read(3);
        if (br.read(1)) { free(scratch); return -2; }
        uint64_t num;
        if (utf8_read(br, &num)) { free(scratch); return -2; }
        int blocksize;
        if (bs_code == 0) { free(scratch); return -2; }
        else if (bs_code == 1) blocksize = 192;
        else if (bs_code <= 5) blocksize = 576 << (bs_code - 2);
        else if (bs_code == 6) blocksize = (int)br.read(8) + 1;
        else if (bs_code == 7) blocksize = (int)br.read(16) + 1;
        else blocksize = 256 << (bs_code - 8);
        if (sr_code == 12) br.read(8);
        else if (sr_code == 13 || sr_code == 14) br.read(16);
        else if (sr_code == 15) { free(scratch); return -2; }
        int fbps = bps;
        switch (bps_code) {
            case 1: fbps = 8; break;  case 2: fbps = 12; break;
            case 4: fbps = 16; break; case 5: fbps = 20; break;
            case 6: fbps = 24; break; case 7: fbps = 32; break;
        }
        size_t hdr_end = (br.pos + 7) / 8;
        uint32_t expect = (uint32_t)br.read(8);
        if (crc8(data + start, hdr_end - start) != expect) {
            free(scratch); return -3;
        }
        if (blocksize > 65536) { free(scratch); return -2; }
        if (done + blocksize > max_samples) { free(scratch); return -4; }

        int nch_frame;
        if (ch_code <= 7) {
            nch_frame = ch_code + 1;
            for (int c = 0; c < nch_frame; c++)
                if (decode_subframe(br, blocksize, fbps, chan[c],
                                    scratch)) {
                    free(scratch); return -5;
                }
        } else if (ch_code == 8) {
            nch_frame = 2;
            if (decode_subframe(br, blocksize, fbps, chan[0], scratch)
                || decode_subframe(br, blocksize, fbps + 1, chan[1],
                                   scratch)) { free(scratch); return -5; }
            for (int i = 0; i < blocksize; i++)
                chan[1][i] = chan[0][i] - chan[1][i];
        } else if (ch_code == 9) {
            nch_frame = 2;
            if (decode_subframe(br, blocksize, fbps + 1, chan[0],
                                scratch)
                || decode_subframe(br, blocksize, fbps, chan[1],
                                   scratch)) { free(scratch); return -5; }
            for (int i = 0; i < blocksize; i++)
                chan[0][i] = chan[1][i] + chan[0][i];
        } else if (ch_code == 10) {
            nch_frame = 2;
            if (decode_subframe(br, blocksize, fbps, chan[0], scratch)
                || decode_subframe(br, blocksize, fbps + 1, chan[1],
                                   scratch)) { free(scratch); return -5; }
            for (int i = 0; i < blocksize; i++) {
                int64_t side = chan[1][i];
                int64_t m2 = (chan[0][i] << 1) | (side & 1);
                chan[0][i] = (m2 + side) >> 1;
                chan[1][i] = (m2 - side) >> 1;
            }
        } else {
            free(scratch); return -2;
        }
        if (nch_frame != channels) { free(scratch); return -2; }
        br.align();
        size_t frame_end = br.pos / 8;
        uint32_t e16 = (uint32_t)br.read(16);
        if (br.fail || crc16(data + start, frame_end - start) != e16) {
            free(scratch); return -6;
        }
        for (int i = 0; i < blocksize; i++)
            for (int c = 0; c < channels; c++)
                out[(done + i) * channels + c] = (int32_t)chan[c][i];
        done += blocksize;
        pos = br.pos / 8;
    }
    free(scratch);
    if (total && (uint64_t)done > total) done = (long)total;
    return done;
}

namespace {

int rice_cost(const int64_t* res, int n, int k) {
    long long bits = 0;
    for (int i = 0; i < n; i++) {
        uint64_t v = ((uint64_t)res[i] << 1) ^ (uint64_t)(res[i] >> 63);
        bits += (long long)(v >> k) + 1 + k;
    }
    return bits > (1LL << 40) ? (1 << 30) : (int)bits;
}

}  // namespace

long gtpu_flac_encode(const int32_t* samples, long n, int ch, int rate,
                      int bps, int blocksize, uint8_t* out,
                      long outcap) {
    init_tabs();
    if (ch < 1 || ch > 8 || blocksize < 16 || blocksize > 32768)
        return -1;
    BitWriter hw{out, (size_t)outcap};
    hw.write(0x664C6143u, 32);
    hw.write(1, 1); hw.write(0, 7); hw.write(34, 24);
    hw.write((uint32_t)blocksize, 16);
    hw.write((uint32_t)blocksize, 16);
    hw.write(0, 24); hw.write(0, 24);
    hw.write((uint32_t)rate, 20);
    hw.write((uint32_t)(ch - 1), 3);
    hw.write((uint32_t)(bps - 1), 5);
    hw.write((uint64_t)n, 36);
    hw.align();
    if (hw.fail) return -1;
    // MD5 slot: the Python binding fills it (hashlib); zero here
    if ((long)hw.nbytes + 16 > outcap) return -1;
    memset(out + hw.nbytes, 0, 16);
    size_t wpos = hw.nbytes + 16;

    int bs_tab_code;
    switch (blocksize) {
        case 192: bs_tab_code = 1; break;
        case 576: bs_tab_code = 2; break;   case 1152: bs_tab_code = 3; break;
        case 2304: bs_tab_code = 4; break;  case 4608: bs_tab_code = 5; break;
        case 256: bs_tab_code = 8; break;   case 512: bs_tab_code = 9; break;
        case 1024: bs_tab_code = 10; break; case 2048: bs_tab_code = 11; break;
        case 4096: bs_tab_code = 12; break; case 8192: bs_tab_code = 13; break;
        case 16384: bs_tab_code = 14; break; case 32768: bs_tab_code = 15; break;
        default: bs_tab_code = 7; break;
    }
    int sr_code = 0;
    switch (rate) {
        case 88200: sr_code = 1; break;  case 176400: sr_code = 2; break;
        case 192000: sr_code = 3; break; case 8000: sr_code = 4; break;
        case 16000: sr_code = 5; break;  case 22050: sr_code = 6; break;
        case 24000: sr_code = 7; break;  case 32000: sr_code = 8; break;
        case 44100: sr_code = 9; break;  case 48000: sr_code = 10; break;
        case 96000: sr_code = 11; break;
    }
    int bps_code = 0;
    switch (bps) {
        case 8: bps_code = 1; break;  case 12: bps_code = 2; break;
        case 16: bps_code = 4; break; case 20: bps_code = 5; break;
        case 24: bps_code = 6; break; case 32: bps_code = 7; break;
    }

    int64_t* x = (int64_t*)malloc(sizeof(int64_t) * blocksize * 6);
    if (!x) return -1;
    int64_t* res = x + blocksize;       // per-order residual scratch

    long fi = 0;
    for (long lo = 0; lo < n; lo += blocksize, fi++) {
        int bs = (int)((n - lo) < blocksize ? (n - lo) : blocksize);
        BitWriter bw{out + wpos, (size_t)(outcap - (long)wpos)};
        bw.write(0x3FFE, 14);
        bw.write(0, 1); bw.write(0, 1);
        int bsc = (bs == blocksize) ? bs_tab_code : 7;
        if (bsc != 7) {
            // exact table value only if bs matches; partial last block
            // may still be a table size
            switch (bs) {
                case 192: bsc = 1; break;
                case 576: bsc = 2; break;  case 1152: bsc = 3; break;
                case 2304: bsc = 4; break; case 4608: bsc = 5; break;
                case 256: bsc = 8; break;  case 512: bsc = 9; break;
                case 1024: bsc = 10; break; case 2048: bsc = 11; break;
                case 4096: bsc = 12; break; case 8192: bsc = 13; break;
                case 16384: bsc = 14; break; case 32768: bsc = 15; break;
                default: bsc = 7; break;
            }
        } else {
            switch (bs) {
                case 192: bsc = 1; break;
                case 576: bsc = 2; break;  case 1152: bsc = 3; break;
                case 2304: bsc = 4; break; case 4608: bsc = 5; break;
                case 256: bsc = 8; break;  case 512: bsc = 9; break;
                case 1024: bsc = 10; break; case 2048: bsc = 11; break;
                case 4096: bsc = 12; break; case 8192: bsc = 13; break;
                case 16384: bsc = 14; break; case 32768: bsc = 15; break;
                default: bsc = 7; break;
            }
        }
        bw.write((uint32_t)bsc, 4);
        bw.write((uint32_t)sr_code, 4);
        bw.write((uint32_t)(ch - 1), 4);
        bw.write((uint32_t)bps_code, 3);
        bw.write(0, 1);
        // utf8 frame number
        {
            uint64_t v = (uint64_t)fi;
            if (v < 0x80) bw.write(v, 8);
            else {
                int n_extra = 1;
                static const int spans[] = {11, 16, 21, 26, 31, 36};
                static const uint32_t leads[] = {0xC0, 0xE0, 0xF0,
                                                 0xF8, 0xFC, 0xFE};
                while (n_extra <= 6 && v >= (1ULL << spans[n_extra - 1]))
                    n_extra++;
                bw.write(leads[n_extra - 1] | (uint32_t)(v >> (6 * n_extra)), 8);
                for (int k = n_extra - 1; k >= 0; k--)
                    bw.write(0x80 | (uint32_t)((v >> (6 * k)) & 0x3F), 8);
            }
        }
        if (bsc == 7) bw.write((uint32_t)(bs - 1), 16);
        bw.align();
        size_t hdr_len = bw.nbytes;
        bw.write(crc8(out + wpos, hdr_len), 8);

        for (int c = 0; c < ch; c++) {
            for (int i = 0; i < bs; i++)
                x[i] = samples[(lo + i) * ch + c];
            bool constant = true;
            for (int i = 1; i < bs; i++)
                if (x[i] != x[0]) { constant = false; break; }
            if (constant) {
                bw.write(0, 1); bw.write(0, 6); bw.write(0, 1);
                bw.write((uint64_t)x[0], bps);
                continue;
            }
            long long best_total = -1;
            int best_order = 0, best_k = 0;
            for (int order = 0; order <= 4 && order < bs; order++) {
                // residual by repeated diff
                int rn = bs - order;
                if (order == 0) {
                    memcpy(res, x, sizeof(int64_t) * bs);
                } else {
                    // recompute diffs from scratch each order (cheap)
                    memcpy(res, x, sizeof(int64_t) * bs);
                    for (int o = 0; o < order; o++)
                        for (int i = 0; i < bs - o - 1; i++)
                            res[i] = res[i + 1] - res[i];
                }
                int bk = 0, bc = rice_cost(res, rn, 0);
                for (int k = 1; k < 15; k++) {
                    int cst = rice_cost(res, rn, k);
                    if (cst < bc) { bk = k; bc = cst; }
                }
                long long total = (long long)order * bps + 2 + 4 + 4
                    + bc;
                if (best_total < 0 || total < best_total) {
                    best_total = total;
                    best_order = order;
                    best_k = bk;
                }
            }
            long long verbatim = (long long)bs * bps;
            if (best_total < 0 || best_total >= verbatim) {
                bw.write(0, 1); bw.write(1, 6); bw.write(0, 1);
                for (int i = 0; i < bs; i++)
                    bw.write((uint64_t)x[i], bps);
                continue;
            }
            // rebuild best residual
            memcpy(res, x, sizeof(int64_t) * bs);
            for (int o = 0; o < best_order; o++)
                for (int i = 0; i < bs - o - 1; i++)
                    res[i] = res[i + 1] - res[i];
            int rn = bs - best_order;
            bw.write(0, 1);
            bw.write((uint32_t)(8 + best_order), 6);
            bw.write(0, 1);
            for (int i = 0; i < best_order; i++)
                bw.write((uint64_t)x[i], bps);
            bw.write(0, 2);
            bw.write(0, 4);
            bw.write((uint32_t)best_k, 4);
            for (int i = 0; i < rn; i++) {
                uint64_t v = ((uint64_t)res[i] << 1)
                    ^ (uint64_t)(res[i] >> 63);
                bw.write_unary((uint32_t)(v >> best_k));
                if (best_k) bw.write(v, best_k);
            }
        }
        bw.align();
        if (bw.fail) { free(x); return -1; }
        uint16_t c16 = crc16(out + wpos, bw.nbytes);
        bw.write(c16, 16);
        wpos += bw.nbytes;
    }
    free(x);
    return (long)wpos;
}

}  // extern "C"
