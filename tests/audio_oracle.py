"""ctypes oracles for compressed-audio parity tests.

Wraps the REAL system codec libraries — libvorbis/libvorbisenc/
libvorbisfile, libopus, libmpg123, libmp3lame — to (a) generate
compressed test vectors and (b) produce gold PCM decodes that the
clean-room decoders in gstreamer_tpu/codecs/ are compared against.
This mirrors tests/gst_ref.py (the libgstvideo ctypes oracle): same
binaries a reference GStreamer install would load via its vorbisdec /
opusdec / mpg123audiodec wrapper elements
(gst-plugins-base/ext/vorbis/gstvorbisdec.c,
 ext/opus/gstopusdec.c, gst-plugins-ugly/ext/mpg123/).

Everything degrades to None when a library is missing; tests skip.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import struct
import tempfile
from typing import List, Optional, Tuple

import numpy as np

c_float_p = ctypes.POINTER(ctypes.c_float)
c_float_pp = ctypes.POINTER(c_float_p)


def _load(*names):
    for n in names:
        try:
            return ctypes.CDLL(n)
        except OSError:
            continue
    return None


_vorbis = _load("libvorbis.so.0", "libvorbis.so")
_vorbisenc = _load("libvorbisenc.so.2", "libvorbisenc.so")
_vorbisfile = _load("libvorbisfile.so.3", "libvorbisfile.so")
_opus = _load("libopus.so.0", "libopus.so")
_mpg123 = _load("libmpg123.so.0", "libmpg123.so")
_lame = _load("libmp3lame.so.0", "libmp3lame.so")


class OggPacket(ctypes.Structure):
    """libogg's ogg_packet (public ABI, ogg/ogg.h)."""
    _fields_ = [("packet", ctypes.POINTER(ctypes.c_ubyte)),
                ("bytes", ctypes.c_long),
                ("b_o_s", ctypes.c_long),
                ("e_o_s", ctypes.c_long),
                ("granulepos", ctypes.c_int64),
                ("packetno", ctypes.c_int64)]

    def data(self) -> bytes:
        return ctypes.string_at(self.packet, self.bytes)


class VorbisInfoView(ctypes.Structure):
    """Leading fields of vorbis_info (codec.h) — read-only view."""
    _fields_ = [("version", ctypes.c_int),
                ("channels", ctypes.c_int),
                ("rate", ctypes.c_long)]


def have_vorbis() -> bool:
    return (_vorbis is not None and _vorbisenc is not None
            and _vorbisfile is not None)


def vorbis_encode_packets(pcm: np.ndarray, rate: int,
                          quality: float = 0.4
                          ) -> Optional[Tuple[List[bytes],
                                              List[Tuple[bytes, int]]]]:
    """float32 (n, ch) -> ([3 header packets], [(audio pkt, granulepos)])."""
    if not have_vorbis():
        return None
    pcm = np.atleast_2d(np.asarray(pcm, np.float32))
    if pcm.shape[0] < pcm.shape[1]:
        pcm = pcm.T
    n, ch = pcm.shape

    vi = ctypes.create_string_buffer(512)
    vc = ctypes.create_string_buffer(512)
    vd = ctypes.create_string_buffer(4096)
    vb = ctypes.create_string_buffer(4096)
    _vorbis.vorbis_info_init(vi)
    _vorbisenc.vorbis_encode_init_vbr.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_float]
    if _vorbisenc.vorbis_encode_init_vbr(vi, ch, rate,
                                         ctypes.c_float(quality)) != 0:
        return None
    _vorbis.vorbis_comment_init(vc)
    _vorbis.vorbis_analysis_init(vd, vi)
    _vorbis.vorbis_block_init(vd, vb)

    hdr = OggPacket()
    hdr_comm = OggPacket()
    hdr_code = OggPacket()
    _vorbis.vorbis_analysis_headerout(vd, vc, ctypes.byref(hdr),
                                      ctypes.byref(hdr_comm),
                                      ctypes.byref(hdr_code))
    headers = [hdr.data(), hdr_comm.data(), hdr_code.data()]

    _vorbis.vorbis_analysis_buffer.restype = c_float_pp
    audio: List[Tuple[bytes, int]] = []

    def drain():
        op = OggPacket()
        while _vorbis.vorbis_analysis_blockout(vd, vb) == 1:
            _vorbis.vorbis_analysis(vb, None)
            _vorbis.vorbis_bitrate_addblock(vb)
            while _vorbis.vorbis_bitrate_flushpacket(
                    vd, ctypes.byref(op)) == 1:
                audio.append((op.data(), int(op.granulepos)))

    step = 4096
    for lo in range(0, n, step):
        chunk = pcm[lo:lo + step]
        buf = _vorbis.vorbis_analysis_buffer(vd, len(chunk))
        for c in range(ch):
            col = np.ascontiguousarray(chunk[:, c])
            ctypes.memmove(buf[c], col.ctypes.data, col.nbytes)
        _vorbis.vorbis_analysis_wrote(vd, len(chunk))
        drain()
    _vorbis.vorbis_analysis_wrote(vd, 0)
    drain()

    _vorbis.vorbis_block_clear(vb)
    _vorbis.vorbis_dsp_clear(vd)
    _vorbis.vorbis_comment_clear(vc)
    _vorbis.vorbis_info_clear(vi)
    return headers, audio


def vorbis_decode_file(path: str) -> Optional[Tuple[np.ndarray, int, int]]:
    """Ogg/Vorbis file -> (float32 (n, ch), rate, channels) via
    libvorbisfile (the gold)."""
    if not have_vorbis():
        return None
    vf = ctypes.create_string_buffer(4096)
    _vorbisfile.ov_fopen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    if _vorbisfile.ov_fopen(path.encode(), vf) != 0:
        return None
    _vorbisfile.ov_info.restype = ctypes.POINTER(VorbisInfoView)
    info = _vorbisfile.ov_info(vf, -1).contents
    ch, rate = info.channels, int(info.rate)
    chunks = []
    while True:
        pp = c_float_pp()
        bs = ctypes.c_int()
        got = _vorbisfile.ov_read_float(vf, ctypes.byref(pp), 4096,
                                        ctypes.byref(bs))
        if got <= 0:
            break
        frame = np.empty((got, ch), np.float32)
        for c in range(ch):
            frame[:, c] = np.ctypeslib.as_array(pp[c], shape=(got,))
        chunks.append(frame)
    _vorbisfile.ov_clear(vf)
    pcm = (np.concatenate(chunks, axis=0) if chunks
           else np.zeros((0, ch), np.float32))
    return pcm, rate, ch


def vorbis_decode_bytes(data: bytes):
    with tempfile.NamedTemporaryFile(suffix=".ogg", delete=False) as f:
        f.write(data)
        path = f.name
    try:
        return vorbis_decode_file(path)
    finally:
        os.unlink(path)


# ---------------------------------------------------------------- opus

def have_opus() -> bool:
    return _opus is not None


OPUS_APPLICATION_AUDIO = 2049


def opus_encode_packets(pcm16: np.ndarray, rate: int = 48000,
                        frame_size: int = 960,
                        bitrate: int = 64000) -> Optional[List[bytes]]:
    """int16 (n, ch) -> list of opus packets (one per frame_size)."""
    if not have_opus():
        return None
    pcm16 = np.atleast_2d(np.asarray(pcm16, np.int16))
    if pcm16.shape[0] < pcm16.shape[1]:
        pcm16 = pcm16.T
    n, ch = pcm16.shape
    pad = (-n) % frame_size
    if pad:
        pcm16 = np.concatenate(
            [pcm16, np.zeros((pad, ch), np.int16)], axis=0)
    err = ctypes.c_int()
    _opus.opus_encoder_create.restype = ctypes.c_void_p
    enc = _opus.opus_encoder_create(rate, ch, OPUS_APPLICATION_AUDIO,
                                    ctypes.byref(err))
    if err.value != 0:
        return None
    # OPUS_SET_BITRATE request id 4002
    _opus.opus_encoder_ctl(ctypes.c_void_p(enc), 4002,
                           ctypes.c_int(bitrate))
    out = ctypes.create_string_buffer(4000)
    packets = []
    for lo in range(0, len(pcm16), frame_size):
        frame = np.ascontiguousarray(pcm16[lo:lo + frame_size])
        got = _opus.opus_encode(
            ctypes.c_void_p(enc),
            frame.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            frame_size, out, 4000)
        if got < 0:
            _opus.opus_encoder_destroy(ctypes.c_void_p(enc))
            return None
        packets.append(out.raw[:got])
    _opus.opus_encoder_destroy(ctypes.c_void_p(enc))
    return packets


def opus_decode_packets(packets: List[bytes], ch: int,
                        rate: int = 48000) -> Optional[np.ndarray]:
    """-> float32 (n, ch) decoded by libopus (the gold)."""
    if not have_opus():
        return None
    err = ctypes.c_int()
    _opus.opus_decoder_create.restype = ctypes.c_void_p
    dec = _opus.opus_decoder_create(rate, ch, ctypes.byref(err))
    if err.value != 0:
        return None
    maxn = 5760
    out = np.empty((maxn, ch), np.float32)
    chunks = []
    for pkt in packets:
        got = _opus.opus_decode_float(
            ctypes.c_void_p(dec), pkt, len(pkt),
            out.ctypes.data_as(c_float_p), maxn, 0)
        if got < 0:
            _opus.opus_decoder_destroy(ctypes.c_void_p(dec))
            return None
        chunks.append(out[:got].copy())
    _opus.opus_decoder_destroy(ctypes.c_void_p(dec))
    return (np.concatenate(chunks, axis=0) if chunks
            else np.zeros((0, ch), np.float32))


# ----------------------------------------------------------------- mp3

def have_lame() -> bool:
    return _lame is not None


def have_mpg123() -> bool:
    return _mpg123 is not None


def lame_encode(pcm16: np.ndarray, rate: int,
                bitrate: int = 128) -> Optional[bytes]:
    """int16 (n, ch<=2) -> mp3 bytes via libmp3lame."""
    if not have_lame():
        return None
    pcm16 = np.atleast_2d(np.asarray(pcm16, np.int16))
    if pcm16.shape[0] < pcm16.shape[1]:
        pcm16 = pcm16.T
    n, ch = pcm16.shape
    _lame.lame_init.restype = ctypes.c_void_p
    gf = ctypes.c_void_p(_lame.lame_init())
    _lame.lame_set_in_samplerate(gf, rate)
    _lame.lame_set_num_channels(gf, ch)
    _lame.lame_set_brate(gf, bitrate)
    _lame.lame_set_quality(gf, 2)
    _lame.lame_set_bWriteVbrTag(gf, 0)
    if _lame.lame_init_params(gf) < 0:
        return None
    cap = max(16384, n * ch * 2)
    out = ctypes.create_string_buffer(cap)
    if ch == 2:
        wrote = _lame.lame_encode_buffer_interleaved(
            gf, np.ascontiguousarray(pcm16).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int16)), n, out, cap)
    else:
        mono = np.ascontiguousarray(pcm16[:, 0])
        p = mono.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))
        wrote = _lame.lame_encode_buffer(gf, p, p, n, out, cap)
    if wrote < 0:
        return None
    blob = out.raw[:wrote]
    fin = _lame.lame_encode_flush(gf, out, cap)
    if fin > 0:
        blob += out.raw[:fin]
    _lame.lame_close(gf)
    return blob


MPG123_ENC_FLOAT_32 = 0x200


def mpg123_decode(data: bytes) -> Optional[Tuple[np.ndarray, int, int]]:
    """mp3 bytes -> (float32 (n, ch), rate, ch) via libmpg123 (gold)."""
    if not have_mpg123():
        return None
    _mpg123.mpg123_init()
    err = ctypes.c_int()
    _mpg123.mpg123_new.restype = ctypes.c_void_p
    h = ctypes.c_void_p(_mpg123.mpg123_new(None, ctypes.byref(err)))
    if not h:
        return None
    _mpg123.mpg123_format_none(h)
    for r in (8000, 11025, 12000, 16000, 22050, 24000,
              32000, 44100, 48000):
        _mpg123.mpg123_format(h, ctypes.c_long(r), 3, MPG123_ENC_FLOAT_32)
    with tempfile.NamedTemporaryFile(suffix=".mp3", delete=False) as f:
        f.write(data)
        path = f.name
    try:
        if _mpg123.mpg123_open(h, path.encode()) != 0:
            return None
        rate = ctypes.c_long()
        ch = ctypes.c_int()
        enc = ctypes.c_int()
        if _mpg123.mpg123_getformat(h, ctypes.byref(rate),
                                    ctypes.byref(ch),
                                    ctypes.byref(enc)) != 0:
            return None
        buf = ctypes.create_string_buffer(65536)
        done = ctypes.c_size_t()
        chunks = []
        while True:
            r = _mpg123.mpg123_read(h, buf, 65536, ctypes.byref(done))
            if done.value:
                chunks.append(np.frombuffer(
                    buf.raw[:done.value], np.float32).copy())
            if r != 0:      # MPG123_OK=0; DONE/-12 or error ends
                break
        _mpg123.mpg123_close(h)
        _mpg123.mpg123_delete(h)
        pcm = (np.concatenate(chunks) if chunks
               else np.zeros(0, np.float32))
        return pcm.reshape(-1, ch.value), int(rate.value), ch.value
    finally:
        os.unlink(path)
