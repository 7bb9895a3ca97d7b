"""Clean-room CELT decoder (codecs/celt.py) vs the system libopus:
bit-parity on CELT-only Opus streams (all frame sizes/bandwidths),
custom-mode streams via the final-range oracle, and random-packet
differential fuzz."""

import ctypes

import numpy as np
import pytest

from gstreamer_tpu.codecs import opus as opusmod
from gstreamer_tpu.codecs.celt import (CELT_CONFIGS, CeltDecoder,
                                       OpusCeltDecoder, cwrsi, pvq_v)

needs_opus = pytest.mark.skipif(not opusmod.available(),
                                reason="system libopus unavailable")

BW = {"nb": 1101, "wb": 1103, "swb": 1104, "fb": 1105}
TOL = 2e-6      # float32 round-off between libopus f32 and our f64


def _lib():
    lib = ctypes.CDLL("libopus.so.0")
    lib.opus_encoder_create.restype = ctypes.c_void_p
    lib.opus_decoder_create.restype = ctypes.c_void_p
    return lib


def _roundtrip(sig, frame, bitrate, bw, channels=1):
    lib = _lib()
    err = ctypes.c_int()
    enc = lib.opus_encoder_create(48000, channels, 2051,
                                  ctypes.byref(err))
    lib.opus_encoder_ctl(ctypes.c_void_p(enc), 4002,
                         ctypes.c_int(bitrate))
    lib.opus_encoder_ctl(ctypes.c_void_p(enc), 4008,
                         ctypes.c_int(BW[bw]))
    dec = lib.opus_decoder_create(48000, channels, ctypes.byref(err))
    buf = ctypes.create_string_buffer(4000)
    fbuf = np.zeros((frame, channels) if channels == 2 else frame,
                    np.float32)
    ours = OpusCeltDecoder()
    worst = 0.0
    for k in range(len(sig) // frame):
        f = np.ascontiguousarray(sig[k * frame:(k + 1) * frame],
                                 np.float32)
        nb = lib.opus_encode_float(
            ctypes.c_void_p(enc), f.ctypes.data_as(ctypes.c_void_p),
            frame, buf, 4000)
        pkt = bytes(buf.raw[:nb])
        lib.opus_decode_float(ctypes.c_void_p(dec), pkt, nb,
                              fbuf.ctypes.data_as(ctypes.c_void_p),
                              frame, 0)
        o = ours.decode(pkt)
        worst = max(worst, float(np.abs(fbuf - o).max()))
    return worst


def _music(n=24000):
    rng = np.random.default_rng(9)
    t = np.arange(n) / 48000.0
    return (0.4 * np.sin(2 * np.pi * 440 * t)
            + 0.2 * np.sin(2 * np.pi * 880 * t * 1.003)
            + 0.1 * np.sin(2 * np.pi * 3000 * t)
            + 0.08 * rng.standard_normal(n))


# --------------------------------------------------------------- unit pieces

def test_pvq_v_counts():
    assert pvq_v(2, 1) == 4
    assert pvq_v(1, 5) == 2
    assert pvq_v(8, 1) == 16
    # V(n,k) = V(n-1,k) + V(n,k-1) + V(n-1,k-1)
    assert pvq_v(5, 3) == pvq_v(4, 3) + pvq_v(5, 2) + pvq_v(4, 2)


def test_cwrsi_bijection():
    for n, k in ((4, 3), (8, 2), (3, 5)):
        seen = set()
        for i in range(pvq_v(n, k)):
            y = tuple(cwrsi(n, k, i))
            assert sum(abs(v) for v in y) == k
            assert len(y) == n
            seen.add(y)
        assert len(seen) == pvq_v(n, k)


def test_celt_configs():
    assert CELT_CONFIGS[31] == (960, 21)
    assert CELT_CONFIGS[16] == (120, 13)


# ------------------------------------------------------------ stream parity

@needs_opus
@pytest.mark.parametrize("frame", [120, 240, 480, 960])
def test_parity_frame_sizes(frame):
    assert _roundtrip(_music(), frame, 64000, "fb") < TOL


@needs_opus
@pytest.mark.parametrize("bw", ["nb", "wb", "swb", "fb"])
def test_parity_bandwidths(bw):
    assert _roundtrip(_music(), 960, 64000, bw) < TOL


@needs_opus
@pytest.mark.parametrize("bitrate", [24000, 128000])
def test_parity_bitrates(bitrate):
    assert _roundtrip(_music(), 960, bitrate, "fb") < TOL


@needs_opus
def test_parity_transients_and_noise():
    rng = np.random.default_rng(3)
    sig = _music()
    sig[10000:10100] += np.hanning(100) * 0.8    # click -> transient
    assert _roundtrip(sig, 960, 64000, "fb") < TOL
    assert _roundtrip(0.3 * rng.standard_normal(24000), 480, 96000,
                      "fb") < TOL


# ------------------------------------------------------- differential fuzz

@needs_opus
def test_random_packet_differential_fuzz():
    """Feed random bytes to both decoders through the opus_custom
    static 48k/960 mode (stronger than valid streams: hits every
    error path) and require identical output."""
    lib = _lib()
    for f in ("opus_custom_mode_create", "opus_custom_decoder_create"):
        getattr(lib, f).restype = ctypes.c_void_p
    lib.opus_custom_decoder_create.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
    lib.opus_custom_decode_float.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int]
    err = ctypes.c_int()
    mode = lib.opus_custom_mode_create(48000, 960, ctypes.byref(err))
    if not mode:
        pytest.skip("no opus_custom support")
    dec = lib.opus_custom_decoder_create(ctypes.c_void_p(mode), 1,
                                         ctypes.byref(err))
    fbuf = np.zeros(960, np.float32)
    rng = np.random.default_rng(42)
    bad = 0
    total = 0
    for size in (2, 4, 6, 8, 12, 20, 40, 80, 159):
        for _ in range(8):
            body = bytes(rng.integers(0, 256, size, np.uint8))
            pkt = bytes([31 << 3]) + body
            lib.opus_custom_decoder_ctl(ctypes.c_void_p(dec), 4028)
            if lib.opus_custom_decode_float(
                    ctypes.c_void_p(dec), pkt, len(pkt),
                    fbuf.ctypes.data_as(ctypes.c_void_p), 960) != 960:
                continue
            d = CeltDecoder()
            o = d.decode_frame(body, 960, 21)
            total += 1
            # relative tolerance: garbage packets can decode to
            # huge energies where float32 ulps exceed 1e-3 absolute
            scale = max(1.0, float(np.abs(fbuf).max()))
            if np.abs(fbuf - o).max() > 1e-3 * scale:
                bad += 1
    assert total > 50
    assert bad == 0, f"{bad}/{total} random packets diverged"


# ----------------------------------------------------------- error handling

def test_silk_and_mode_switch_raise():
    d = OpusCeltDecoder()
    with pytest.raises(ValueError):
        d.decode(bytes([(0 << 3), 0]))          # SILK config
    d2 = OpusCeltDecoder()
    d2.decode(bytes([(31 << 3) | 4, 0]))        # stereo ok now
    with pytest.raises(ValueError):
        d2.decode(bytes([(31 << 3), 0]))        # mono switch rejected


@needs_opus
def test_parity_stereo():
    rng = np.random.default_rng(11)
    n = 24000
    t = np.arange(n) / 48000.0
    L = 0.4 * np.sin(2 * np.pi * 440 * t) \
        + 0.05 * rng.standard_normal(n)
    R = 0.3 * np.sin(2 * np.pi * 660 * t + 0.5) \
        + 0.05 * rng.standard_normal(n)
    stereo = np.stack([L, R], axis=1)
    assert _roundtrip(stereo, 960, 96000, "fb", channels=2) < TOL
    assert _roundtrip(stereo, 480, 64000, "fb", channels=2) < TOL
    # near-mono (mid-dominant) and inverted (side/inv-flag) content
    assert _roundtrip(np.stack([L, 0.99 * L], axis=1), 960, 64000,
                      "fb", channels=2) < TOL
    assert _roundtrip(np.stack([L, -L], axis=1), 960, 64000, "fb",
                      channels=2) < TOL


@needs_opus
def test_stereo_random_packet_fuzz():
    lib = _lib()
    for f in ("opus_custom_mode_create", "opus_custom_decoder_create"):
        getattr(lib, f).restype = ctypes.c_void_p
    lib.opus_custom_decoder_create.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
    lib.opus_custom_decode_float.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int]
    err = ctypes.c_int()
    mode = lib.opus_custom_mode_create(48000, 960, ctypes.byref(err))
    if not mode:
        pytest.skip("no opus_custom support")
    dec = lib.opus_custom_decoder_create(ctypes.c_void_p(mode), 2,
                                         ctypes.byref(err))
    fbuf = np.zeros((960, 2), np.float32)
    rng = np.random.default_rng(7)
    bad = total = 0
    for size in (4, 8, 16, 32, 64, 120):
        for _ in range(8):
            body = bytes(rng.integers(0, 256, size, np.uint8))
            pkt = bytes([(31 << 3) | 4]) + body
            lib.opus_custom_decoder_ctl(ctypes.c_void_p(dec), 4028)
            if lib.opus_custom_decode_float(
                    ctypes.c_void_p(dec), pkt, len(pkt),
                    fbuf.ctypes.data_as(ctypes.c_void_p), 960) != 960:
                continue
            d = CeltDecoder(2)
            o = d.decode_frame(body, 960, 21)
            total += 1
            scale = max(1.0, float(np.abs(fbuf).max()))
            if np.abs(fbuf - o).max() > 1e-3 * scale:
                bad += 1
    assert total > 30
    assert bad == 0, f"{bad}/{total} stereo packets diverged"
