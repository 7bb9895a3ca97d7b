// Native JPEG baseline entropy codec (Huffman scan encode/decode).
//
// The TPU JPEG codec (gstreamer_tpu/codecs/jpeg.py) runs its DCT/IDCT
// and quantization as device matmuls; the inherently sequential
// entropy coding is the host-bound part.  This implements it natively
// (the reference capability equivalent is libjpeg's jdhuff.c/jchuff.c
// behind gst-plugins-good/ext/jpeg).  Bit-for-bit identical to the
// Python path in codecs/jpeg.py, which remains the gold fallback.
//
// Decode uses the same 16-bit lookahead tables the Python decoder
// builds; encode takes (code, length) tables per symbol.  Coefficients
// are exchanged in zigzag order, one int32[64] block per (component,
// block-row, block-col), exactly the numpy layout of jpeg.py.

#include <cstdint>
#include <cstring>

namespace {

struct BitReader {
  const uint8_t* data;
  long n;
  long pos = 0;
  uint64_t acc = 0;
  int nbits = 0;

  void fill() {
    while (nbits <= 48) {
      uint8_t b = 0;
      if (pos < n) {
        b = data[pos];
        if (b == 0xFF) {
          uint8_t nxt = (pos + 1 < n) ? data[pos + 1] : 0;
          if (nxt == 0x00) {
            pos += 2;
          } else {
            // marker: feed zeros, do not consume
            acc = (acc << 8);
            nbits += 8;
            continue;
          }
        } else {
          pos += 1;
        }
      }
      acc = (acc << 8) | b;
      nbits += 8;
    }
  }

  inline uint32_t peek16() {
    if (nbits < 16) fill();
    return (uint32_t)((acc >> (nbits - 16)) & 0xFFFF);
  }

  inline void skip(int k) {
    nbits -= k;
    acc &= (nbits >= 64) ? ~0ULL : ((1ULL << nbits) - 1);
  }

  inline uint32_t get(int k) {
    if (k == 0) return 0;
    if (nbits < k) fill();
    uint32_t v = (uint32_t)((acc >> (nbits - k)) & ((1ULL << k) - 1));
    skip(k);
    return v;
  }

  void align_to_marker() {
    // drop partial byte, then expect FFxx (RSTn)
    skip(nbits % 8);
    // rewind the zero-fed bytes: recompute pos conservatively —
    // the python caller only uses restart in-decoder; here we simply
    // scan forward in the raw stream for the next RST marker.
  }
};

inline int extend(int v, int size) {
  if (size == 0) return 0;
  return (v >= (1 << (size - 1))) ? v : v - (1 << size) + 1;
}

struct Huff {
  const int16_t* val;  // [65536]
  const int8_t* len;   // [65536]
};

}  // namespace

extern "C" {

// Decode one baseline interleaved scan.
//   data/n           : entropy-coded scan bytes (starting after SOS)
//   mcux/mcuy        : MCU grid
//   restart          : restart interval in MCUs (0 = none)
//   ncomp            : components in scan (1..4)
//   comp_h/comp_v    : sampling factors per component
//   comp_bw          : block-columns per component (bw)
//   dc_idx/ac_idx    : table index per component into luts
//   lut_val/lut_len  : ntab stacked 65536-entry lookahead tables
//   coef             : per-component output, int32[bh*bw*64] zigzag
// Returns 0 on success, <0 on error.
int gtpu_jpeg_decode_scan(const uint8_t* data, long n, int mcux, int mcuy,
                          int restart, int ncomp, const int* comp_h,
                          const int* comp_v, const int* comp_bw,
                          const int* dc_idx, const int* ac_idx,
                          const int16_t* lut_val, const int8_t* lut_len,
                          int32_t** coef) {
  BitReader br{data, n};
  int pred[4] = {0, 0, 0, 0};
  long mcu_count = 0;
  for (int my = 0; my < mcuy; ++my) {
    for (int mx = 0; mx < mcux; ++mx) {
      if (restart && mcu_count && mcu_count % restart == 0) {
        // byte-align and skip the RSTn marker in the raw stream
        br.skip(br.nbits % 8);
        if (br.pos < n - 1 && data[br.pos] == 0xFF &&
            data[br.pos + 1] >= 0xD0 && data[br.pos + 1] <= 0xD7) {
          br.pos += 2;
        }
        br.acc = 0;
        br.nbits = 0;
        for (int c = 0; c < ncomp; ++c) pred[c] = 0;
      }
      for (int c = 0; c < ncomp; ++c) {
        Huff dc{lut_val + (long)dc_idx[c] * 65536,
                lut_len + (long)dc_idx[c] * 65536};
        Huff ac{lut_val + (long)ac_idx[c] * 65536,
                lut_len + (long)ac_idx[c] * 65536};
        for (int by = 0; by < comp_v[c]; ++by) {
          for (int bx = 0; bx < comp_h[c]; ++bx) {
            uint32_t key = br.peek16();
            int len = dc.len[key];
            if (len == 0) return -1;
            br.skip(len);
            int size = dc.val[key];
            int diff = extend((int)br.get(size), size);
            pred[c] += diff;
            long row = (long)my * comp_v[c] + by;
            long col = (long)mx * comp_h[c] + bx;
            int32_t* blk = coef[c] + (row * comp_bw[c] + col) * 64;
            memset(blk, 0, 64 * sizeof(int32_t));
            blk[0] = pred[c];
            int k = 1;
            while (k < 64) {
              key = br.peek16();
              len = ac.len[key];
              if (len == 0) return -2;
              br.skip(len);
              int rs = ac.val[key];
              int r = rs >> 4, s = rs & 0xF;
              if (s == 0) {
                if (r == 15) {
                  k += 16;
                  continue;
                }
                break;  // EOB
              }
              k += r;
              if (k > 63) break;
              blk[k] = extend((int)br.get(s), s);
              k += 1;
            }
          }
        }
      }
      mcu_count += 1;
    }
  }
  return 0;
}

// Encode one baseline interleaved scan.
//   coef             : per-component zigzag coefficients (as above)
//   codes/lens       : per table: uint16[256] code, uint8[256] length
//   out/out_cap      : output buffer; returns bytes written or <0
long gtpu_jpeg_encode_scan(int mcux, int mcuy, int ncomp, const int* comp_h,
                           const int* comp_v, const int* comp_bw,
                           const int* dc_idx, const int* ac_idx,
                           const uint16_t* codes, const uint8_t* lens,
                           int32_t** coef, uint8_t* out, long out_cap) {
  uint64_t acc = 0;
  int nbits = 0;
  long w = 0;

  auto put = [&](uint32_t code, int len) -> bool {
    acc = (acc << len) | (code & ((len >= 32) ? 0xFFFFFFFFu
                                              : ((1u << len) - 1)));
    nbits += len;
    while (nbits >= 8) {
      uint8_t b = (uint8_t)((acc >> (nbits - 8)) & 0xFF);
      if (w + 2 > out_cap) return false;
      out[w++] = b;
      if (b == 0xFF) out[w++] = 0x00;
      nbits -= 8;
      acc &= (1ULL << nbits) - 1;
    }
    return true;
  };

  int pred[4] = {0, 0, 0, 0};
  for (int my = 0; my < mcuy; ++my) {
    for (int mx = 0; mx < mcux; ++mx) {
      for (int c = 0; c < ncomp; ++c) {
        const uint16_t* dct_c = codes + (long)dc_idx[c] * 256;
        const uint8_t* dct_l = lens + (long)dc_idx[c] * 256;
        const uint16_t* act_c = codes + (long)ac_idx[c] * 256;
        const uint8_t* act_l = lens + (long)ac_idx[c] * 256;
        for (int by = 0; by < comp_v[c]; ++by) {
          for (int bx = 0; bx < comp_h[c]; ++bx) {
            long row = (long)my * comp_v[c] + by;
            long col = (long)mx * comp_h[c] + bx;
            const int32_t* blk = coef[c] + (row * comp_bw[c] + col) * 64;
            int dc = blk[0];
            int diff = dc - pred[c];
            pred[c] = dc;
            int a = diff < 0 ? -diff : diff;
            int size = 0;
            while (a) {
              size++;
              a >>= 1;
            }
            int bits = diff > 0 ? diff : diff + (1 << size) - 1;
            if (!put(dct_c[size], dct_l[size])) return -1;
            if (size && !put((uint32_t)bits, size)) return -1;
            int last = 0;
            for (int k = 63; k >= 1; --k) {
              if (blk[k]) {
                last = k;
                break;
              }
            }
            int run = 0;
            for (int k = 1; k <= last; ++k) {
              int v = blk[k];
              if (v == 0) {
                run++;
                continue;
              }
              while (run > 15) {
                if (!put(act_c[0xF0], act_l[0xF0])) return -1;
                run -= 16;
              }
              a = v < 0 ? -v : v;
              size = 0;
              while (a) {
                size++;
                a >>= 1;
              }
              bits = v > 0 ? v : v + (1 << size) - 1;
              if (!put(act_c[(run << 4) | size], act_l[(run << 4) | size]))
                return -1;
              if (!put((uint32_t)bits, size)) return -1;
              run = 0;
            }
            if (last < 63) {
              if (!put(act_c[0x00], act_l[0x00])) return -1;
            }
          }
        }
      }
    }
  }
  // flush with 1-padding
  if (nbits) {
    int pad = 8 - nbits;
    if (!put((1u << pad) - 1, pad)) return -1;
  }
  return w;
}

}  // extern "C"
