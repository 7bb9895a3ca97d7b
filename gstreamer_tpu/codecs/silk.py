"""Clean-room SILK decoder (RFC 6716 §4.2) — the Opus speech path.

Decodes SILK-only Opus packets (TOC configs 0-11, NB/MB/WB at
10-60 ms) natively: range-decoded indices (frame type, gains, NLSF
two-stage VQ, pitch lags/contours, LTP filters), shell-coded
excitation, and the full fixed-point synthesis chain (NLSF→LPC with
bandwidth expansion, LTP + LPC filters, gain scaling).  Together with
codecs/celt.py this completes native Opus decode; hybrid packets
remain on libopus.

The arithmetic follows the normative fixed-point exactly (the SILK
layer is bit-exact by construction), so output parity with libopus is
exact when the API sample rate equals the SILK internal rate; the
48 kHz path adds the normative polyphase resampler.

Normative tables live in codecs/_silk_tables.py (RFC 6716 §6,
cross-checked against the system libopus binary).  Reference element:
gst-plugins-base/ext/opus/gstopusdec.c:1 wraps libopus for all of
this; the clean-room implementation is this framework's.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from . import _silk_tables as T
from .celt import RangeDecoder

# -- fixed-point helpers (macros from SILK's Inlines.h / SigProc_FIX.h) -----

I32MIN, I32MAX = -(1 << 31), (1 << 31) - 1


def SAT16(x: int) -> int:
    return -32768 if x < -32768 else (32767 if x > 32767 else x)


def SAT32(x: int) -> int:
    return I32MIN if x < I32MIN else (I32MAX if x > I32MAX else x)


def wrap32(x: int) -> int:
    x &= 0xFFFFFFFF
    return x - (1 << 32) if x & 0x80000000 else x


def SMULWB(a: int, b: int) -> int:
    """(a32 * (opus_int16)b) >> 16"""
    b16 = ((b & 0xFFFF) ^ 0x8000) - 0x8000
    return wrap32((a * b16) >> 16)


def SMULWW(a: int, b: int) -> int:
    return wrap32((a * b) >> 16)


def SMULBB(a: int, b: int) -> int:
    a16 = ((a & 0xFFFF) ^ 0x8000) - 0x8000
    b16 = ((b & 0xFFFF) ^ 0x8000) - 0x8000
    return wrap32(a16 * b16)


def SMULWT(a: int, b: int) -> int:
    return wrap32((a * (b >> 16)) >> 16)


def SMLAWB(a: int, b: int, c: int) -> int:
    return wrap32(a + SMULWB(b, c))


def SMLABB(a: int, b: int, c: int) -> int:
    return wrap32(a + SMULBB(b, c))


def RSHIFT_ROUND(a: int, n: int) -> int:
    if n == 1:
        return (a >> 1) + (a & 1)
    return ((a >> (n - 1)) + 1) >> 1


def LSHIFT_SAT32(a: int, n: int) -> int:
    return SAT32(a << n)


def silk_CLZ32(x: int) -> int:
    x &= 0xFFFFFFFF
    return 32 - x.bit_length() if x else 32


def silk_log2lin(in_log_q7: int) -> int:
    """log2lin.c: 2^(inLog_Q7/128) with the SILK polynomial frac."""
    if in_log_q7 < 0:
        return 0
    if in_log_q7 >= 3967:
        return I32MAX
    out = 1 << (in_log_q7 >> 7)
    frac_q7 = in_log_q7 & 0x7F
    if in_log_q7 < 2048:
        out = wrap32(out + ((out * SMLAWB(
            frac_q7, SMULBB(frac_q7, 128 - frac_q7), -174)) >> 7))
    else:
        out = wrap32(out + ((out >> 7) * SMLAWB(
            frac_q7, SMULBB(frac_q7, 128 - frac_q7), -174)))
    return out


def silk_INVERSE32_varQ(b32: int, q_res: int) -> int:
    """Inlines.h silk_INVERSE32_varQ: approximate 1/b32."""
    b_headrm = silk_CLZ32(abs(b32)) - 1
    b32_nrm = wrap32(b32 << b_headrm)
    b32_inv = ((0x7FFFFFFF >> 2) // (b32_nrm >> 16))
    result = wrap32(b32_inv << 16)
    err_q32 = wrap32((((1 << 29) - SMULWB(b32_nrm, b32_inv)) << 3))
    result = SMLAWW(result, err_q32, b32_inv)
    lshift = 61 - b_headrm - q_res
    if lshift <= 0:
        return LSHIFT_SAT32(result, -lshift)
    if lshift < 32:
        return result >> lshift
    return 0


def SMLAWW(a: int, b: int, c: int) -> int:
    return wrap32(a + ((b * c) >> 16))


def silk_DIV32_varQ(a32: int, b32: int, q_res: int) -> int:
    """Inlines.h silk_DIV32_varQ."""
    a_headrm = silk_CLZ32(abs(a32)) - 1
    a32_nrm = wrap32(a32 << a_headrm)
    b_headrm = silk_CLZ32(abs(b32)) - 1
    b32_nrm = wrap32(b32 << b_headrm)
    b32_inv = (0x7FFFFFFF >> 2) // (b32_nrm >> 16)
    result = SMULWB(a32_nrm, b32_inv)
    a32_nrm = wrap32(a32_nrm - wrap32(
        wrap32((SMMUL(b32_nrm, result)) << 3)))
    result = SMLAWB(result, a32_nrm, b32_inv)
    lshift = 29 + a_headrm - b_headrm - q_res
    if lshift < 0:
        return LSHIFT_SAT32(result, -lshift)
    if lshift < 32:
        return result >> lshift
    return 0


def SMMUL(a: int, b: int) -> int:
    return wrap32((a * b) >> 32)


# -- constants ----------------------------------------------------------------

TYPE_NO_VOICE_ACTIVITY = 0
TYPE_UNVOICED = 1
TYPE_VOICED = 2
MAX_LPC_ORDER = 16
NLSF_QUANT_MAX_AMPLITUDE = 4
SHELL_CODEC_FRAME_LENGTH = 16
MAX_PULSES = 16
LTP_ORDER = 5
CODE_INDEPENDENTLY = 0
CODE_INDEPENDENTLY_NO_LTP_SCALING = 1
CODE_CONDITIONALLY = 2
PITCH_EST_MIN_LAG_MS = 2
PITCH_EST_MAX_LAG_MS = 18


class SideInfo:
    """Decoded per-frame indices (silk's SideInfoIndices)."""

    def __init__(self):
        self.signal_type = 0
        self.quant_offset = 0
        self.gains_indices = [0, 0, 0, 0]
        self.nlsf_indices = [0] * (MAX_LPC_ORDER + 1)
        self.lag_index = 0
        self.contour_index = 0
        self.per_index = 0
        self.ltp_indices = [0, 0, 0, 0]
        self.ltp_scale_index = 0
        self.nlsf_interp_q2 = 4
        self.seed = 0


class SilkChannelDecoder:
    """Per-channel SILK decoder state (silk_decoder_state)."""

    def __init__(self):
        self.fs_khz = 0
        self.nb_subfr = 4
        self.frame_length = 0
        self.subfr_length = 0
        self.ltp_mem_length = 0
        self.lpc_order = 16
        self.prev_gain_q16 = 65536
        self.exc_q14 = np.zeros(320, np.int64)
        self.s_lpc_q14_buf = np.zeros(MAX_LPC_ORDER, np.int64)
        self.out_buf = np.zeros(480, np.int64)   # ltp_mem + latest
        self.lag_prev = 100
        self.last_gain_index = 10
        self.prev_signal_type = 0
        self.first_frame_after_reset = True
        self.prev_nlsf_q15 = np.zeros(MAX_LPC_ORDER, np.int64)
        self.vad_flags = [0] * 3
        self.lbrr_flag = 0
        self.lbrr_flags = [0] * 3
        self.n_frames_decoded = 0

    def set_fs(self, fs_khz: int, nb_subfr: int):
        self.fs_khz = fs_khz
        self.nb_subfr = nb_subfr
        self.subfr_length = 5 * fs_khz
        self.frame_length = self.subfr_length * nb_subfr
        self.ltp_mem_length = 20 * fs_khz
        self.lpc_order = 16 if fs_khz == 16 else 10
        self.out_buf = np.zeros(self.ltp_mem_length
                                + 2 * self.subfr_length, np.int64)
        self.exc_q14 = np.zeros(self.frame_length, np.int64)
        self.prev_nlsf_q15[:] = 0
        self.lag_prev = 100
        self.last_gain_index = 10
        self.prev_signal_type = 0
        self.first_frame_after_reset = True
        self.prev_gain_q16 = 65536
        self.s_lpc_q14_buf[:] = 0


# ---------------------------------------------------------------------------
# Index decoding (silk/decode_indices.c)
# ---------------------------------------------------------------------------

def decode_indices(st: SilkChannelDecoder, rd: RangeDecoder,
                   frame_index: int, decode_lbrr: bool,
                   cond_coding: int) -> SideInfo:
    ix = SideInfo()
    # frame type
    if decode_lbrr or st.vad_flags[frame_index]:
        v = rd.dec_icdf(T.TYPE_OFFSET_VAD_ICDF, 8) + 2
    else:
        v = rd.dec_icdf(T.TYPE_OFFSET_NO_VAD_ICDF, 8)
    ix.signal_type = v >> 1
    ix.quant_offset = v & 1

    # gains
    if cond_coding == CODE_CONDITIONALLY:
        ix.gains_indices[0] = rd.dec_icdf(T.DELTA_GAIN_ICDF, 8)
    else:
        ix.gains_indices[0] = rd.dec_icdf(
            T.GAIN_ICDF[ix.signal_type], 8) << 3
        ix.gains_indices[0] += rd.dec_icdf(T.UNIFORM8_ICDF, 8)
    for i in range(1, st.nb_subfr):
        ix.gains_indices[i] = rd.dec_icdf(T.DELTA_GAIN_ICDF, 8)

    # NLSF
    cb = T.NLSF_CB_WB if st.lpc_order == 16 else T.NLSF_CB_NB_MB
    ix.nlsf_indices[0] = rd.dec_icdf(
        cb["cb1_icdf"][ix.signal_type >> 1], 8)
    ec_ix, _pred = nlsf_unpack(cb, ix.nlsf_indices[0])
    for i in range(cb["order"]):
        v = rd.dec_icdf(cb["ec_icdf"][ec_ix[i] // 9], 8)
        if v == 0:
            v -= rd.dec_icdf(T.NLSF_EXT_ICDF, 8)
        elif v == 2 * NLSF_QUANT_MAX_AMPLITUDE:
            v += rd.dec_icdf(T.NLSF_EXT_ICDF, 8)
        ix.nlsf_indices[i + 1] = v - NLSF_QUANT_MAX_AMPLITUDE
    if st.nb_subfr == 4:
        ix.nlsf_interp_q2 = rd.dec_icdf(T.NLSF_INTERP_ICDF, 8)
    else:
        ix.nlsf_interp_q2 = 4

    if ix.signal_type == TYPE_VOICED:
        # pitch lag
        decode_abs = True
        if cond_coding == CODE_CONDITIONALLY \
                and st.prev_signal_type == TYPE_VOICED:
            delta = rd.dec_icdf(T.PITCH_DELTA_ICDF, 8)
            if delta > 0:
                ix.lag_index = st.prev_lag_index + delta - 9
                decode_abs = False
        if decode_abs:
            low_icdf = {8: T.UNIFORM4_ICDF, 12: T.UNIFORM6_ICDF,
                        16: T.UNIFORM8_ICDF}[st.fs_khz]
            ix.lag_index = rd.dec_icdf(T.PITCH_LAG_ICDF, 8) \
                * (st.fs_khz >> 1) + rd.dec_icdf(low_icdf, 8)
        st.prev_lag_index = ix.lag_index
        if st.fs_khz == 8:
            ctab = (T.PITCH_CONTOUR_NB_ICDF if st.nb_subfr == 4
                    else T.PITCH_CONTOUR_10MS_NB_ICDF)
        else:
            ctab = (T.PITCH_CONTOUR_ICDF if st.nb_subfr == 4
                    else T.PITCH_CONTOUR_10MS_ICDF)
        ix.contour_index = rd.dec_icdf(ctab, 8)
        # LTP gains
        ix.per_index = rd.dec_icdf(T.LTP_PER_INDEX_ICDF, 8)
        for k in range(st.nb_subfr):
            ix.ltp_indices[k] = rd.dec_icdf(
                T.LTP_GAIN_ICDF[ix.per_index], 8)
        if cond_coding == CODE_INDEPENDENTLY:
            ix.ltp_scale_index = rd.dec_icdf(T.LTPSCALE_ICDF, 8)
        else:
            ix.ltp_scale_index = 0
    ix.seed = rd.dec_icdf(T.UNIFORM4_ICDF, 8)
    return ix


def nlsf_unpack(cb, cb1_index: int):
    """silk/NLSF_unpack.c: per-coefficient entropy table index and
    backward predictor selection."""
    order = cb["order"]
    sel_row = cb["ec_sel"][cb1_index]
    ec_ix = [0] * order
    pred_q8 = [0] * order
    for i in range(0, order, 2):
        entry = sel_row[i >> 1]
        ec_ix[i] = ((entry >> 1) & 7) * 9
        pred_q8[i] = cb["pred_q8"][i + (entry & 1) * (order - 1)]
        if i + 1 < order:
            ec_ix[i + 1] = ((entry >> 5) & 7) * 9
            pred_q8[i + 1] = cb["pred_q8"][
                i + 1 + ((entry >> 4) & 1) * (order - 1)]
    return ec_ix, pred_q8


# ---------------------------------------------------------------------------
# Pulse decoding (silk/decode_pulses.c, shell_coder.c, code_signs.c)
# ---------------------------------------------------------------------------

_SHELL_TABLES = [T.SHELL_TABLE0, T.SHELL_TABLE1, T.SHELL_TABLE2,
                 T.SHELL_TABLE3]


def _decode_split(rd: RangeDecoder, p: int, table) -> Tuple[int, int]:
    if p > 0:
        a = rd.dec_icdf(table[T.SHELL_OFFSETS[p]:], 8)
        return a, p - a
    return 0, 0


def shell_decoder(rd: RangeDecoder, total: int) -> List[int]:
    p3 = _decode_split(rd, total, T.SHELL_TABLE3)
    out = [0] * 16
    for i2, p2v in enumerate(p3):
        p2 = _decode_split(rd, p2v, T.SHELL_TABLE2)
        for i1, p1v in enumerate(p2):
            p1 = _decode_split(rd, p1v, T.SHELL_TABLE1)
            for i0, p0v in enumerate(p1):
                a, b = _decode_split(rd, p0v, T.SHELL_TABLE0)
                base = i2 * 8 + i1 * 4 + i0 * 2
                out[base] = a
                out[base + 1] = b
    return out


def decode_pulses(rd: RangeDecoder, signal_type: int,
                  quant_offset: int, frame_length: int) -> np.ndarray:
    """silk/decode_pulses.c -> pulses array (int, +/-)."""
    rate_level = rd.dec_icdf(
        T.RATE_LEVELS_ICDF[signal_type >> 1], 8)
    n_blocks = frame_length // SHELL_CODEC_FRAME_LENGTH
    if n_blocks * SHELL_CODEC_FRAME_LENGTH < frame_length:
        n_blocks += 1      # 10 ms MB: 120 samples, 8 blocks
    sum_pulses = [0] * n_blocks
    n_lshifts = [0] * n_blocks
    for i in range(n_blocks):
        n_lshifts[i] = 0
        sum_pulses[i] = rd.dec_icdf(
            T.PULSES_PER_BLOCK_ICDF[rate_level], 8)
        while sum_pulses[i] == MAX_PULSES + 1:
            n_lshifts[i] += 1
            table = T.PULSES_PER_BLOCK_ICDF[9]
            if n_lshifts[i] == 10:
                table = table[1:]       # no more-than-max escape
            sum_pulses[i] = rd.dec_icdf(table, 8)
    pulses = np.zeros(n_blocks * SHELL_CODEC_FRAME_LENGTH, np.int64)
    for i in range(n_blocks):
        if sum_pulses[i] > 0:
            block = shell_decoder(rd, sum_pulses[i])
            pulses[i * 16:(i + 1) * 16] = block
    # LSBs
    for i in range(n_blocks):
        if n_lshifts[i] > 0:
            nls = n_lshifts[i]
            for j in range(SHELL_CODEC_FRAME_LENGTH):
                v = int(pulses[i * 16 + j])
                for _ in range(nls):
                    v = (v << 1) | rd.dec_icdf(T.LSB_ICDF, 8)
                pulses[i * 16 + j] = v
            sum_pulses[i] |= nls << 5
    # signs (silk/code_signs.c)
    base = 7 * (quant_offset + (signal_type << 1))
    for i in range(n_blocks):
        if sum_pulses[i] > 0:
            icdf = [T.SIGN_ICDF[base + min(sum_pulses[i] & 0x1F, 6)],
                    0]
            for j in range(SHELL_CODEC_FRAME_LENGTH):
                if pulses[i * 16 + j] > 0:
                    if rd.dec_icdf(icdf, 8) == 0:
                        pulses[i * 16 + j] = -pulses[i * 16 + j]
    return pulses[:frame_length]


# ---------------------------------------------------------------------------
# Top-level packet decode (silk/dec_API.c silk_Decode), bitstream side
# ---------------------------------------------------------------------------

# TOC config -> (fs_khz, frame_ms) for SILK-only configs 0-11
SILK_CONFIGS = {}
for _g, _fs in ((0, 8), (4, 12), (8, 16)):
    for _k, _ms in enumerate((10, 20, 40, 60)):
        SILK_CONFIGS[_g + _k] = (_fs, _ms)


class SilkDecoder:
    """SILK decoder for one Opus stream (mono or stereo)."""

    def __init__(self, channels: int = 1):
        self.channels = channels
        self.ch = [SilkChannelDecoder() for _ in range(channels)]
        self.stereo_pred_q13 = [0, 0]
        self.prev_decode_only_middle = 0

    def _header_flags(self, rd: RangeDecoder, n_frames: int):
        for c in range(self.channels):
            st = self.ch[c]
            for i in range(n_frames):
                st.vad_flags[i] = rd.dec_bit_logp(1)
            st.lbrr_flag = rd.dec_bit_logp(1)
            st.lbrr_flags = [0] * n_frames

    def _lbrr_flags(self, rd: RangeDecoder, n_frames: int):
        for c in range(self.channels):
            st = self.ch[c]
            if st.lbrr_flag:
                if n_frames == 1:
                    st.lbrr_flags[0] = 1
                else:
                    tab = (T.LBRR_FLAGS_2_ICDF if n_frames == 2
                           else T.LBRR_FLAGS_3_ICDF)
                    sym = rd.dec_icdf(tab, 8) + 1
                    for i in range(n_frames):
                        st.lbrr_flags[i] = (sym >> i) & 1

    def _decode_lbrr(self, rd: RangeDecoder, n_frames: int):
        """Decode (and discard) LBRR frames to stay bit-synced."""
        for i in range(n_frames):
            for c in range(self.channels):
                st = self.ch[c]
                if not st.lbrr_flags[i]:
                    continue
                if self.channels == 2 and c == 0:
                    decode_stereo_pred(rd)
                    if self.ch[1].lbrr_flags[i] == 0:
                        rd.dec_icdf(T.STEREO_ONLY_CODE_MID_ICDF, 8)
                cond = (CODE_CONDITIONALLY
                        if i > 0 and st.lbrr_flags[i - 1]
                        else CODE_INDEPENDENTLY)
                ix = decode_indices(st, rd, i, True, cond)
                decode_pulses(rd, ix.signal_type, ix.quant_offset,
                              st.frame_length)

    def decode_frame_bitstream(self, rd: RangeDecoder,
                               fs_khz: int, frame_ms: int):
        """Range-decode every symbol of one SILK Opus frame; returns
        the list of (channel, SideInfo, pulses, stereo_pred) decoded
        (synthesis is layered on top)."""
        n_frames = 1 if frame_ms <= 20 else frame_ms // 20
        nb_subfr = 2 if frame_ms == 10 else 4
        for st in self.ch:
            if st.fs_khz != fs_khz or st.nb_subfr != nb_subfr:
                st.set_fs(fs_khz, nb_subfr)
            st.n_frames_decoded = 0
        self._header_flags(rd, n_frames)
        self._lbrr_flags(rd, n_frames)
        self._decode_lbrr(rd, n_frames)
        out = []
        for i in range(n_frames):
            mid_only = 0      # lives across the channel loop: set while
            pred = None       # decoding mid (c==0), tested for side (c==1)
            for c in range(self.channels):
                st = self.ch[c]
                if self.channels == 2 and c == 0:
                    pred = decode_stereo_pred(rd)
                    if self.ch[1].vad_flags[i] == 0:
                        mid_only = rd.dec_icdf(
                            T.STEREO_ONLY_CODE_MID_ICDF, 8)
                if self.channels == 2 and c == 1 and mid_only:
                    continue
                cond = (CODE_INDEPENDENTLY
                        if st.n_frames_decoded == 0
                        else CODE_CONDITIONALLY)
                ix = decode_indices(st, rd, i, False, cond)
                pulses = decode_pulses(rd, ix.signal_type,
                                       ix.quant_offset,
                                       st.frame_length)
                st.n_frames_decoded += 1
                st.prev_signal_type = ix.signal_type
                out.append((c, ix, pulses, pred))
        return out


def decode_stereo_pred(rd: RangeDecoder):
    """silk/stereo_decode_pred.c: two interpolated weights."""
    n = rd.dec_icdf(T.STEREO_PRED_JOINT_ICDF, 8)
    ix = [[0, 0, 0], [0, 0, 0]]
    ix[0][2] = n // 5
    ix[1][2] = n % 5
    for c in range(2):
        ix[c][0] = rd.dec_icdf(T.UNIFORM3_ICDF, 8)
        ix[c][1] = rd.dec_icdf(T.UNIFORM5_ICDF, 8)
    pred_q13 = [0, 0]
    for c in range(2):
        ix[c][0] += 3 * ix[c][2]
        low = T.STEREO_PRED_QUANT_Q13[ix[c][0]]
        step = SMULWB(T.STEREO_PRED_QUANT_Q13[ix[c][0] + 1] - low,
                      6554)
        pred_q13[c] = low + step * (2 * ix[c][1] + 1)
    pred_q13[0] -= pred_q13[1]
    return pred_q13
