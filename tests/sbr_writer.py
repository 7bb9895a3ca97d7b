"""HE-AAC v1 test-vector writer: splice SBR FIL payloads into
libav-encoded AAC-LC ADTS frames.

The rig has no HE-AAC encoder (ffmpeg's native aac is LC-only), so
conformance vectors are crafted here: the LC core comes from the
system encoder at the core rate, and this module writes the SBR
extension (ISO/IEC 14496-3 §4.4.2.8 sbr_extension_data) bit-exactly
— header, FIXFIX grids (1/2/4 envelopes), freq-coded
envelopes/noise via the normative Huffman codebooks, sinusoidal
coding, and both SCE and CPE (coupled and independent) layouts.
The system libavcodec HE-AAC decoder then serves as the conformance
oracle for BOTH sides: if it parses these streams and produces the
expected spectrum, the writer (and the shared frequency-table
derivation in codecs/sbr.py) matches the normative decoder; its PCM
output and in-memory derived state (tests/sbr_oracle.py) are then
the parity gold for codecs/sbr.py.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from gstreamer_tpu.codecs import _sbr_tables as T
from gstreamer_tpu.codecs.aac import (AACDecoder, Bits,
                                      SAMPLE_RATES,
                                      parse_adts_header)
from gstreamer_tpu.codecs.sbr import SbrHeader, make_freq_tables


class BitWriter:
    def __init__(self):
        self.bits: List[int] = []

    def put(self, val: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)

    def put_bits(self, bits: List[int]) -> None:
        self.bits.extend(bits)

    def to_bytes(self) -> bytes:
        bits = self.bits + [0] * ((8 - len(self.bits) % 8) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        return bytes(out)


def _henc(bw: BitWriter, sym: int, codes, bits, lav: int) -> None:
    i = sym + lav
    bw.put(codes[i], bits[i])


def _write_header(bw: BitWriter, hdr: SbrHeader) -> None:
    bw.put(hdr.amp_res, 1)
    bw.put(hdr.start_freq, 4)
    bw.put(hdr.stop_freq, 4)
    bw.put(hdr.xover_band, 3)
    bw.put(0, 2)                          # bs_reserved
    extra1 = (hdr.freq_scale != 2 or hdr.alter_scale != 1
              or hdr.noise_bands != 2)
    extra2 = (hdr.limiter_bands != 2 or hdr.limiter_gains != 2
              or hdr.interpol_freq != 1
              or hdr.smoothing_mode != 1)
    bw.put(1 if extra1 else 0, 1)
    bw.put(1 if extra2 else 0, 1)
    if extra1:
        bw.put(hdr.freq_scale, 2)
        bw.put(hdr.alter_scale, 1)
        bw.put(hdr.noise_bands, 2)
    if extra2:
        bw.put(hdr.limiter_bands, 2)
        bw.put(hdr.limiter_gains, 2)
        bw.put(hdr.interpol_freq, 1)
        bw.put(hdr.smoothing_mode, 1)


def _write_grid(bw: BitWriter, num_env: int, freq_res: int) -> None:
    """FIXFIX grid with 1/2/4 envelopes."""
    bw.put(0, 2)                          # frame_class FIXFIX
    bw.put({1: 0, 2: 1, 4: 2}[num_env], 2)
    bw.put(freq_res, 1)


def _write_dtdf(bw: BitWriter, num_env: int, num_noise: int) -> None:
    for _ in range(num_env):
        bw.put(0, 1)                      # df_env: freq-coded
    for _ in range(num_noise):
        bw.put(0, 1)                      # df_noise


def _env_tables(amp_res: int, balance: bool):
    if balance:
        if amp_res:
            return (T.F_HUFFMAN_ENV_BAL_3_0DB_CODES,
                    T.F_HUFFMAN_ENV_BAL_3_0DB_BITS, 12, 5)
        return (T.F_HUFFMAN_ENV_BAL_1_5DB_CODES,
                T.F_HUFFMAN_ENV_BAL_1_5DB_BITS, 24, 6)
    if amp_res:
        return (T.F_HUFFMAN_ENV_3_0DB_CODES,
                T.F_HUFFMAN_ENV_3_0DB_BITS, 31, 6)
    return (T.F_HUFFMAN_ENV_1_5DB_CODES,
            T.F_HUFFMAN_ENV_1_5DB_BITS, 60, 7)


def _write_envelope(bw: BitWriter, env_rows: List[List[int]],
                    amp_res: int, balance: bool) -> None:
    """Freq-coded (df=0) rows of quantized (pre-doubling) values."""
    fc, fb, lav, start_bits = _env_tables(amp_res, balance)
    for vals in env_rows:
        bw.put(vals[0], start_bits)
        for k in range(1, len(vals)):
            _henc(bw, vals[k] - vals[k - 1], fc, fb, lav)


def _write_noise(bw: BitWriter, noise_rows: List[List[int]],
                 balance: bool) -> None:
    if balance:
        fc, fb, lav = (T.F_HUFFMAN_ENV_BAL_3_0DB_CODES,
                       T.F_HUFFMAN_ENV_BAL_3_0DB_BITS, 12)
    else:
        fc, fb, lav = (T.F_HUFFMAN_ENV_3_0DB_CODES,
                       T.F_HUFFMAN_ENV_3_0DB_BITS, 31)
    for vals in noise_rows:
        bw.put(vals[0], 5)
        for k in range(1, len(vals)):
            _henc(bw, vals[k] - vals[k - 1], fc, fb, lav)


def _rows(vals: Sequence, n_rows: int, n_cols: int) -> List[List[int]]:
    """Broadcast scalar/flat/nested value specs to rows x cols."""
    if np.isscalar(vals[0]):
        if len(vals) == n_rows:
            return [[int(v)] * n_cols for v in vals]
        row = (list(vals) if len(vals) == n_cols
               else [int(vals[0])] * n_cols)
        return [list(row) for _ in range(n_rows)]
    return [list(r) if len(r) == n_cols else [int(r[0])] * n_cols
            for r in vals]


def sbr_payload_bits(hdr: SbrHeader, sample_rate: int,
                     env_q: Sequence, noise_q: Sequence,
                     with_header: bool,
                     amp_res: Optional[int] = None,
                     freq_res: int = 1,
                     invf_mode: int = 2,
                     num_env: int = 1,
                     add_harmonic: Optional[List[int]] = None,
                     ps: bool = False) -> List[int]:
    """One SCE sbr_extension_data payload (after the extension-type
    nibble).  FIXFIX grid, freq-coded (df=0) envelopes and noise."""
    ft = make_freq_tables(hdr, sample_rate)
    n_bands = (len(ft.f_high) if freq_res else len(ft.f_low)) - 1
    n_q = len(ft.f_noise) - 1
    num_noise = 2 if num_env > 1 else 1
    eff_amp = (0 if num_env == 1
               else hdr.amp_res) if amp_res is None else amp_res
    bw = BitWriter()
    bw.put(1 if with_header else 0, 1)
    if with_header:
        _write_header(bw, hdr)
    # sbr_single_channel_element
    bw.put(0, 1)                          # bs_data_extra
    _write_grid(bw, num_env, freq_res)
    _write_dtdf(bw, num_env, num_noise)
    for _ in range(n_q):
        bw.put(invf_mode, 2)
    _write_envelope(bw, _rows(env_q, num_env, n_bands),
                    eff_amp, False)
    _write_noise(bw, _rows(noise_q, num_noise, n_q), False)
    if add_harmonic:
        bw.put(1, 1)
        n_high = len(ft.f_high) - 1
        bits = (list(add_harmonic) + [0] * n_high)[:n_high]
        for b in bits:
            bw.put(1 if b else 0, 1)
    else:
        bw.put(0, 1)                      # bs_add_harmonic_flag
    if ps:
        # extended data carrying an (empty) PS extension id so the
        # decoder's HE-AAC v2 detection path can be exercised
        bw.put(1, 1)                      # bs_extended_data
        bw.put(2, 4)                      # cnt = 2 bytes
        bw.put(2, 2)                      # EXTENSION_ID_PS
        bw.put(0, 10)                     # padding
    else:
        bw.put(0, 1)                      # bs_extended_data
    return bw.bits


def sbr_cpe_payload_bits(hdr: SbrHeader, sample_rate: int,
                         env_q: Sequence, noise_q: Sequence,
                         with_header: bool,
                         coupling: bool = False,
                         env_bal: Sequence = (12,),
                         noise_bal: Sequence = (12,),
                         env_q1: Optional[Sequence] = None,
                         noise_q1: Optional[Sequence] = None,
                         freq_res: int = 1,
                         invf_mode: int = 2,
                         num_env: int = 1) -> List[int]:
    """One CPE sbr_extension_data payload.  In coupled mode the
    second channel carries balance values (pre-doubling, lav-offset
    quantized); in independent mode it carries its own levels."""
    ft = make_freq_tables(hdr, sample_rate)
    n_bands = (len(ft.f_high) if freq_res else len(ft.f_low)) - 1
    n_q = len(ft.f_noise) - 1
    num_noise = 2 if num_env > 1 else 1
    eff_amp = 0 if num_env == 1 else hdr.amp_res
    bw = BitWriter()
    bw.put(1 if with_header else 0, 1)
    if with_header:
        _write_header(bw, hdr)
    bw.put(0, 1)                          # bs_data_extra
    bw.put(1 if coupling else 0, 1)
    if coupling:
        _write_grid(bw, num_env, freq_res)
        _write_dtdf(bw, num_env, num_noise)
        _write_dtdf(bw, num_env, num_noise)
        for _ in range(n_q):
            bw.put(invf_mode, 2)
        _write_envelope(bw, _rows(env_q, num_env, n_bands),
                        eff_amp, False)
        _write_noise(bw, _rows(noise_q, num_noise, n_q), False)
        _write_envelope(bw, _rows(env_bal, num_env, n_bands),
                        eff_amp, True)
        _write_noise(bw, _rows(noise_bal, num_noise, n_q), True)
    else:
        _write_grid(bw, num_env, freq_res)
        _write_grid(bw, num_env, freq_res)
        _write_dtdf(bw, num_env, num_noise)
        _write_dtdf(bw, num_env, num_noise)
        for _ in range(n_q):
            bw.put(invf_mode, 2)
        for _ in range(n_q):
            bw.put(invf_mode, 2)
        _write_envelope(bw, _rows(env_q, num_env, n_bands),
                        eff_amp, False)
        _write_envelope(bw, _rows(env_q1 or env_q, num_env,
                                  n_bands), eff_amp, False)
        _write_noise(bw, _rows(noise_q, num_noise, n_q), False)
        _write_noise(bw, _rows(noise_q1 or noise_q, num_noise,
                               n_q), False)
    bw.put(0, 1)                          # bs_add_harmonic_flag ch0
    bw.put(0, 1)                          # bs_add_harmonic_flag ch1
    bw.put(0, 1)                          # bs_extended_data
    return bw.bits


def splice_sbr_adts(adts: bytes, hdr: SbrHeader,
                    env_q: Sequence = (70,),
                    noise_q: Sequence = (25,),
                    freq_res: int = 1, invf_mode: int = 2,
                    num_env: int = 1,
                    add_harmonic: Optional[List[int]] = None,
                    ps: bool = False,
                    cpe: Optional[dict] = None) -> bytes:
    """Append an SBR FIL element to every raw_data_block of an LC
    ADTS stream -> HE-AAC v1 (implicit signalling).  `cpe` switches
    to the channel-pair payload with the given kwargs."""
    out = bytearray()
    pos = 0
    dec = None
    first = True
    while pos + 7 <= len(adts):
        ah = parse_adts_header(adts, pos)
        if ah is None:
            pos += 1
            continue
        flen, sfi, cc, profile, hlen = ah
        if dec is None:
            dec = AACDecoder(sfi, cc)
            sample_rate = SAMPLE_RATES[sfi] * 2
        payload = adts[pos + hlen:pos + flen]
        br = Bits(payload)
        dec.decode_frame(br)
        end_pos = dec._end_bitpos         # bit offset of the END id
        body = []
        for i in range(end_pos):
            body.append((payload[i >> 3] >> (7 - (i & 7))) & 1)
        if cpe is not None:
            sbr_bits = sbr_cpe_payload_bits(
                hdr, sample_rate, env_q, noise_q,
                with_header=first, **cpe)
        else:
            sbr_bits = sbr_payload_bits(
                hdr, sample_rate, env_q, noise_q,
                with_header=first, freq_res=freq_res,
                invf_mode=invf_mode, num_env=num_env,
                add_harmonic=add_harmonic, ps=ps)
        first = False
        # fill_element: id FIL, 4-bit count (+esc), ext nibble, data
        content_bits = 4 + len(sbr_bits)
        cnt = (content_bits + 7) // 8
        bw = BitWriter()
        bw.put_bits(body)
        bw.put(6, 3)                      # FIL
        if cnt >= 15:
            bw.put(15, 4)
            bw.put(cnt - 14, 8)
        else:
            bw.put(cnt, 4)
        bw.put(0xD, 4)                    # EXT_SBR_DATA
        bw.put_bits(sbr_bits)
        pad = 8 * cnt - content_bits
        bw.put(0, pad)
        bw.put(7, 3)                      # END
        frame = bw.to_bytes()
        new_len = hlen + len(frame)
        ah_bytes = bytearray(adts[pos:pos + hlen])
        ah_bytes[3] = (ah_bytes[3] & 0xFC) | ((new_len >> 11) & 0x3)
        ah_bytes[4] = (new_len >> 3) & 0xFF
        ah_bytes[5] = (ah_bytes[5] & 0x1F) | ((new_len & 0x7) << 5)
        out += bytes(ah_bytes) + frame
        pos += flen
    return bytes(out)
