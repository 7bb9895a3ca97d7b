"""SILK bitstream decoder parity tests.

Oracle: libopus (system library) final range — OPUS_GET_FINAL_RANGE
returns the range coder's `rng` after the decoder consumed the packet;
it matches ours iff every decoded symbol used identical probability
windows (RFC 6716 #4.1.6.1 integrity check).

Reference layer map: gst-plugins-base/ext/opus wraps libopus; here the
SILK layer (RFC 6716 #4.2) is decoded clean-room.
"""

import ctypes

import numpy as np
import pytest

try:
    _lib = ctypes.CDLL("libopus.so.0")
    _lib.opus_encoder_create.restype = ctypes.c_void_p
    _lib.opus_decoder_create.restype = ctypes.c_void_p
    HAVE_OPUS = True
except OSError:
    HAVE_OPUS = False

pytestmark = pytest.mark.skipif(not HAVE_OPUS, reason="libopus missing")

OPUS_SET_FORCE_MODE = 11002
MODE_SILK_ONLY = 1000
OPUS_SET_BANDWIDTH = 4004
OPUS_SET_BITRATE = 4002
OPUS_SET_INBAND_FEC = 4012
OPUS_SET_PACKET_LOSS_PERC = 4014
OPUS_GET_FINAL_RANGE = 4031


def _speechish(n, channels, seed=1):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 48000.0
    sig = (0.3 * np.sin(2 * np.pi * 155 * t)
           * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))
           + 0.1 * rng.standard_normal(n)
           * (np.sin(2 * np.pi * 1.5 * t) > 0))
    if channels == 2:
        sig = np.stack([sig, np.roll(sig, 100) * 0.8], 1)
    return sig


def _parity(bw, frame, bitrate, channels=1, fec=False, seconds=1):
    from gstreamer_tpu.codecs.celt import RangeDecoder, parse_opus_packet
    from gstreamer_tpu.codecs.silk import SILK_CONFIGS, SilkDecoder

    err = ctypes.c_int()
    enc = _lib.opus_encoder_create(48000, channels, 2048,
                                   ctypes.byref(err))
    _lib.opus_encoder_ctl(ctypes.c_void_p(enc), OPUS_SET_FORCE_MODE,
                          ctypes.c_int(MODE_SILK_ONLY))
    _lib.opus_encoder_ctl(ctypes.c_void_p(enc), OPUS_SET_BANDWIDTH,
                          ctypes.c_int(bw))
    _lib.opus_encoder_ctl(ctypes.c_void_p(enc), OPUS_SET_BITRATE,
                          ctypes.c_int(bitrate))
    if fec:
        _lib.opus_encoder_ctl(ctypes.c_void_p(enc), OPUS_SET_INBAND_FEC,
                              ctypes.c_int(1))
        _lib.opus_encoder_ctl(ctypes.c_void_p(enc),
                              OPUS_SET_PACKET_LOSS_PERC,
                              ctypes.c_int(30))
    dec = _lib.opus_decoder_create(48000, channels, ctypes.byref(err))
    n = 48000 * seconds
    sig = _speechish(n, channels)
    buf = ctypes.create_string_buffer(4000)
    fbuf = np.zeros((frame, channels), np.float32)
    silk = SilkDecoder(channels)
    ok = bad = 0
    for k in range(n // frame):
        f = np.ascontiguousarray(sig[k * frame:(k + 1) * frame],
                                 np.float32)
        nb = _lib.opus_encode_float(
            ctypes.c_void_p(enc), f.ctypes.data_as(ctypes.c_void_p),
            frame, buf, 4000)
        pkt = bytes(buf.raw[:nb])
        config = pkt[0] >> 3
        if config not in SILK_CONFIGS:
            continue
        _lib.opus_decode_float(
            ctypes.c_void_p(dec), pkt, nb,
            fbuf.ctypes.data_as(ctypes.c_void_p), frame, 0)
        r = ctypes.c_uint32()
        _lib.opus_decoder_ctl(ctypes.c_void_p(dec), OPUS_GET_FINAL_RANGE,
                              ctypes.byref(r))
        fs_khz, frame_ms = SILK_CONFIGS[config]
        _, _, frames = parse_opus_packet(pkt)
        last = None
        for fr in frames:
            rd = RangeDecoder(fr)
            silk.decode_frame_bitstream(rd, fs_khz, frame_ms)
            last = rd.rng & 0xFFFFFFFF
        if last == r.value:
            ok += 1
        else:
            bad += 1
    assert ok > 0
    assert bad == 0, f"{bad}/{ok + bad} packets had range mismatch"


def test_wb_20ms_mono():
    _parity(1103, 960, 24000)


def test_nb_20ms_mono():
    _parity(1101, 960, 12000)


def test_mb_20ms_mono():
    _parity(1102, 960, 16000)


def test_wb_10ms_mono():
    _parity(1103, 480, 24000)


def test_wb_40ms_mono():
    _parity(1103, 1920, 24000)


def test_wb_60ms_mono():
    _parity(1103, 2880, 32000)


def test_wb_20ms_stereo():
    _parity(1103, 960, 32000, channels=2)


def test_nb_20ms_stereo():
    _parity(1101, 960, 24000, channels=2)


def test_wb_40ms_stereo():
    _parity(1103, 1920, 32000, channels=2)


def test_wb_20ms_mono_fec():
    _parity(1103, 960, 32000, fec=True)


def test_wb_20ms_stereo_fec():
    # exercises LBRR frames + the mid-only side-skip flag
    _parity(1103, 960, 32000, channels=2, fec=True)


def _pcm_parity(bw, bitrate, channels, seconds=1):
    """Full-chain parity: HybridOpusDecoder (native SILK + resampler)
    must produce float PCM identical to libopus at 48 kHz."""
    from gstreamer_tpu.codecs.opus import HybridOpusDecoder, OpusDecoder

    err = ctypes.c_int()
    enc = _lib.opus_encoder_create(48000, channels, 2048,
                                   ctypes.byref(err))
    _lib.opus_encoder_ctl(ctypes.c_void_p(enc), OPUS_SET_FORCE_MODE,
                          ctypes.c_int(MODE_SILK_ONLY))
    _lib.opus_encoder_ctl(ctypes.c_void_p(enc), OPUS_SET_BANDWIDTH,
                          ctypes.c_int(bw))
    _lib.opus_encoder_ctl(ctypes.c_void_p(enc), OPUS_SET_BITRATE,
                          ctypes.c_int(bitrate))
    n = 48000 * seconds
    sig = _speechish(n, channels, seed=3)
    buf = ctypes.create_string_buffer(4000)
    hyb = HybridOpusDecoder(channels)
    ref = OpusDecoder(channels)
    mine, theirs = [], []
    for k in range(n // 960):
        f = np.ascontiguousarray(sig[k * 960:(k + 1) * 960],
                                 np.float32)
        nb = _lib.opus_encode_float(
            ctypes.c_void_p(enc), f.ctypes.data_as(ctypes.c_void_p),
            960, buf, 4000)
        pkt = bytes(buf.raw[:nb])
        if (pkt[0] >> 3) > 11:
            continue
        mine.append(hyb.decode(pkt))
        theirs.append(ref.decode(pkt))
    m = np.concatenate(mine)
    r = np.concatenate(theirs)
    assert m.shape == r.shape
    assert np.array_equal(m, r), \
        f"maxdiff {np.abs(m - r).max()}"


def test_pcm_wb_mono():
    _pcm_parity(1103, 24000, 1)


def test_pcm_nb_mono():
    _pcm_parity(1101, 14000, 1)


def test_pcm_mb_mono():
    _pcm_parity(1102, 16000, 1)


def test_pcm_wb_stereo():
    _pcm_parity(1103, 32000, 2)


def _hybrid_parity(bw, frame48, channels, tol=1e-6):
    """Native hybrid decode (SILK WB + CELT bands 17-21, shared range
    coder) vs libopus float output."""
    from gstreamer_tpu.codecs.opus import HybridOpusDecoder, OpusDecoder

    err = ctypes.c_int()
    enc = _lib.opus_encoder_create(48000, channels, 2048,
                                   ctypes.byref(err))
    _lib.opus_encoder_ctl(ctypes.c_void_p(enc), OPUS_SET_FORCE_MODE,
                          ctypes.c_int(1001))   # MODE_HYBRID
    _lib.opus_encoder_ctl(ctypes.c_void_p(enc), OPUS_SET_BANDWIDTH,
                          ctypes.c_int(bw))
    _lib.opus_encoder_ctl(ctypes.c_void_p(enc), OPUS_SET_BITRATE,
                          ctypes.c_int(32000 * channels))
    rng = np.random.default_rng(3)
    t = np.arange(48000) / 48000.0
    sig = (0.3 * np.sin(2 * np.pi * 155 * t)
           * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))
           + 0.08 * rng.standard_normal(48000)
           + 0.05 * np.sin(2 * np.pi * 9000 * t))
    if channels == 2:
        sig = np.stack([sig, np.roll(sig, 120) * 0.7], 1)
    buf = ctypes.create_string_buffer(4000)
    hyb = HybridOpusDecoder(channels)
    ref = OpusDecoder(channels)
    mine, theirs = [], []
    for k in range(48000 // frame48):
        f = np.ascontiguousarray(sig[k * frame48:(k + 1) * frame48],
                                 np.float32)
        nb = _lib.opus_encode_float(
            ctypes.c_void_p(enc), f.ctypes.data_as(ctypes.c_void_p),
            frame48, buf, 4000)
        pkt = bytes(buf.raw[:nb])
        assert 12 <= (pkt[0] >> 3) <= 15
        mine.append(hyb.decode(pkt))
        theirs.append(ref.decode(pkt))
    m = np.concatenate(mine)
    r = np.concatenate(theirs)
    assert m.shape == r.shape
    assert np.abs(m - r).max() < tol


def test_hybrid_swb_mono():
    _hybrid_parity(1104, 960, 1)


def test_hybrid_fb_mono():
    _hybrid_parity(1105, 960, 1)


def test_hybrid_fb_10ms_mono():
    _hybrid_parity(1105, 480, 1)


def test_hybrid_fb_stereo():
    _hybrid_parity(1105, 960, 2)


def test_fec_recovery_bit_exact():
    """Native LBRR (FEC) recovery of a lost packet matches
    opus_decode(..., decode_fec=1) and leaves the decoder state
    aligned for all subsequent packets."""
    from gstreamer_tpu.codecs.celt import RangeDecoder, parse_opus_packet
    from gstreamer_tpu.codecs.silk import SILK_CONFIGS, SilkDecoder

    err = ctypes.c_int()
    enc = _lib.opus_encoder_create(48000, 1, 2048, ctypes.byref(err))
    for ctl, v in ((OPUS_SET_FORCE_MODE, MODE_SILK_ONLY),
                   (OPUS_SET_BANDWIDTH, 1103),
                   (OPUS_SET_BITRATE, 32000),
                   (OPUS_SET_INBAND_FEC, 1),
                   (OPUS_SET_PACKET_LOSS_PERC, 30)):
        _lib.opus_encoder_ctl(ctypes.c_void_p(enc), ctl,
                              ctypes.c_int(v))
    sig = _speechish(48000, 1, seed=3)
    buf = ctypes.create_string_buffer(4000)
    pkts = []
    for k in range(30):
        f = np.ascontiguousarray(sig[k * 960:(k + 1) * 960],
                                 np.float32)
        nb = _lib.opus_encode_float(
            ctypes.c_void_p(enc), f.ctypes.data_as(ctypes.c_void_p),
            960, buf, 4000)
        pkts.append(bytes(buf.raw[:nb]))
    # find a packet carrying LBRR for its predecessor
    lost = None
    for k in range(3, len(pkts)):
        sk = SilkDecoder(1)
        _, _, frames = parse_opus_packet(pkts[k])
        rd = RangeDecoder(frames[0])
        sk.ch[0].set_fs(16, 4)
        sk._header_flags(rd, 1)
        sk._lbrr_flags(rd, 1)
        if sk.ch[0].lbrr_flags[0]:
            lost = k - 1
            break
    if lost is None:
        pytest.skip("encoder produced no LBRR packets")
    dec = _lib.opus_decoder_create(16000, 1, ctypes.byref(err))
    fb = np.zeros(320, np.int16)
    silk = SilkDecoder(1)
    mine, ref = [], []
    for k in range(lost + 4):
        src = pkts[lost + 1] if k == lost else pkts[k]
        fec = 1 if k == lost else 0
        nd = _lib.opus_decode(ctypes.c_void_p(dec), src, len(src),
                              fb.ctypes.data_as(ctypes.c_void_p),
                              320, fec)
        ref.append(fb[:nd].astype(np.int64).copy())
        _, _, frames = parse_opus_packet(src)
        rd = RangeDecoder(frames[0])
        if k == lost:
            pcm = silk.decode_packet_fec(rd, 16, 20)
            assert pcm is not None
        else:
            pcm = silk.decode_packet(rd, 16, 20)
        mine.append(pcm[:, 0])
    m = np.concatenate(mine)
    r = np.concatenate(ref)
    D = 12                              # fixed libopus latency @16k
    n = len(m) - D
    assert np.array_equal(m[:n], r[D:D + n])


def test_plc_fallback():
    from gstreamer_tpu.codecs.opus import HybridOpusDecoder
    err = ctypes.c_int()
    enc = _lib.opus_encoder_create(48000, 1, 2048, ctypes.byref(err))
    for ctl, v in ((OPUS_SET_FORCE_MODE, MODE_SILK_ONLY),
                   (OPUS_SET_BANDWIDTH, 1103),
                   (OPUS_SET_BITRATE, 24000)):
        _lib.opus_encoder_ctl(ctypes.c_void_p(enc), ctl,
                              ctypes.c_int(v))
    sig = _speechish(4800, 1)
    buf = ctypes.create_string_buffer(4000)
    f = np.ascontiguousarray(sig[:960], np.float32)
    nb = _lib.opus_encode_float(
        ctypes.c_void_p(enc), f.ctypes.data_as(ctypes.c_void_p),
        960, buf, 4000)
    hyb = HybridOpusDecoder(1)
    out = hyb.decode(bytes(buf.raw[:nb]))
    plc = hyb.decode_plc(960)
    assert plc.shape == out.shape
    # concealment decays rather than repeating at full level
    assert np.abs(plc).max() <= np.abs(out).max() + 1e-6
