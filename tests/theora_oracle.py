"""ctypes oracle for Theora parity tests.

Wraps the REAL system libtheoraenc/libtheoradec — the same libraries
the reference's theoraenc/theoradec elements load
(gst-plugins-base/ext/theora/gsttheoraenc.c, gsttheoradec.c) — to
generate compressed vectors and gold YUV decodes for the clean-room
decoder in gstreamer_tpu/codecs/theora.py.
"""

from __future__ import annotations

import ctypes
from typing import List, Optional, Tuple

import numpy as np

_enc = None
_dec = None
_tried = False


def _load():
    global _enc, _dec, _tried
    if _tried:
        return
    _tried = True
    try:
        # enc depends on dec's symbols: load dec globally first
        _dec = ctypes.CDLL("libtheoradec.so.1",
                           mode=ctypes.RTLD_GLOBAL)
        _enc = ctypes.CDLL("libtheoraenc.so.1")
    except OSError:
        _enc = _dec = None


def have_theora() -> bool:
    _load()
    return _enc is not None and _dec is not None


class OggPacket(ctypes.Structure):
    _fields_ = [("packet", ctypes.POINTER(ctypes.c_ubyte)),
                ("bytes", ctypes.c_long),
                ("b_o_s", ctypes.c_long),
                ("e_o_s", ctypes.c_long),
                ("granulepos", ctypes.c_int64),
                ("packetno", ctypes.c_int64)]

    def data(self) -> bytes:
        return ctypes.string_at(self.packet, self.bytes)


class ThInfo(ctypes.Structure):
    _fields_ = [("version_major", ctypes.c_ubyte),
                ("version_minor", ctypes.c_ubyte),
                ("version_subminor", ctypes.c_ubyte),
                ("frame_width", ctypes.c_uint32),
                ("frame_height", ctypes.c_uint32),
                ("pic_width", ctypes.c_uint32),
                ("pic_height", ctypes.c_uint32),
                ("pic_x", ctypes.c_uint32),
                ("pic_y", ctypes.c_uint32),
                ("fps_numerator", ctypes.c_uint32),
                ("fps_denominator", ctypes.c_uint32),
                ("aspect_numerator", ctypes.c_uint32),
                ("aspect_denominator", ctypes.c_uint32),
                ("colorspace", ctypes.c_int),
                ("pixel_fmt", ctypes.c_int),
                ("target_bitrate", ctypes.c_int),
                ("quality", ctypes.c_int),
                ("keyframe_granule_shift", ctypes.c_int)]


class ThComment(ctypes.Structure):
    _fields_ = [("user_comments", ctypes.POINTER(ctypes.c_char_p)),
                ("comment_lengths", ctypes.POINTER(ctypes.c_int)),
                ("comments", ctypes.c_int),
                ("vendor", ctypes.c_char_p)]


class ThImgPlane(ctypes.Structure):
    _fields_ = [("width", ctypes.c_int),
                ("height", ctypes.c_int),
                ("stride", ctypes.c_int),
                ("data", ctypes.POINTER(ctypes.c_ubyte))]


ThYCbCr = ThImgPlane * 3

TH_PF_420 = 0
TH_PF_422 = 2
TH_PF_444 = 3


def encode_packets(frames: List[Tuple[np.ndarray, np.ndarray,
                                      np.ndarray]],
                   pic_w: int, pic_h: int, pixel_fmt: int = TH_PF_420,
                   quality: int = 48, keyframe_shift: int = 6
                   ) -> Optional[Tuple[List[bytes], List[bytes]]]:
    """Y/Cb/Cr plane frames -> ([3 header packets], [frame packets]).

    Planes must already be padded to multiples of 16 (Y) with matching
    chroma sizes for the pixel format."""
    _load()
    if _enc is None:
        return None
    fw, fh = (pic_w + 15) & ~15, (pic_h + 15) & ~15
    info = ThInfo()
    _dec.th_info_init(ctypes.byref(info))
    info.frame_width, info.frame_height = fw, fh
    info.pic_width, info.pic_height = pic_w, pic_h
    info.pic_x = info.pic_y = 0
    info.fps_numerator, info.fps_denominator = 30, 1
    info.aspect_numerator = info.aspect_denominator = 1
    info.colorspace = 0
    info.pixel_fmt = pixel_fmt
    info.target_bitrate = 0
    info.quality = quality
    info.keyframe_granule_shift = keyframe_shift
    _enc.th_encode_alloc.restype = ctypes.c_void_p
    ctx = ctypes.c_void_p(_enc.th_encode_alloc(ctypes.byref(info)))
    if not ctx:
        return None
    tc = ThComment()
    _dec.th_comment_init(ctypes.byref(tc))
    headers = []
    op = OggPacket()
    while _enc.th_encode_flushheader(ctx, ctypes.byref(tc),
                                     ctypes.byref(op)) > 0:
        headers.append(op.data())

    if pixel_fmt == TH_PF_420:
        cw, chh = fw // 2, fh // 2
    elif pixel_fmt == TH_PF_422:
        cw, chh = fw // 2, fh
    else:
        cw, chh = fw, fh
    packets = []
    for y, cb, cr in frames:
        y = np.ascontiguousarray(y, np.uint8)
        cb = np.ascontiguousarray(cb, np.uint8)
        cr = np.ascontiguousarray(cr, np.uint8)
        assert y.shape == (fh, fw), (y.shape, fh, fw)
        assert cb.shape == (chh, cw) and cr.shape == (chh, cw)
        buf = ThYCbCr()
        for i, arr in enumerate((y, cb, cr)):
            buf[i].width = arr.shape[1]
            buf[i].height = arr.shape[0]
            buf[i].stride = arr.shape[1]
            buf[i].data = arr.ctypes.data_as(
                ctypes.POINTER(ctypes.c_ubyte))
        if _enc.th_encode_ycbcr_in(ctx, buf) != 0:
            _enc.th_encode_free(ctx)
            return None
        while _enc.th_encode_packetout(ctx, 0, ctypes.byref(op)) > 0:
            packets.append(op.data())
    # flush
    while _enc.th_encode_packetout(ctx, 1, ctypes.byref(op)) > 0:
        packets.append(op.data())
    _enc.th_encode_free(ctx)
    _dec.th_comment_clear(ctypes.byref(tc))
    return headers, packets


def decode_packets(headers: List[bytes], packets: List[bytes]
                   ) -> Optional[Tuple[List[Tuple[np.ndarray,
                                                  np.ndarray,
                                                  np.ndarray]],
                                       ThInfo]]:
    """Gold decode via libtheoradec -> list of full-frame (Y, Cb, Cr)
    planes (frame_width x frame_height, NOT cropped)."""
    _load()
    if _dec is None:
        return None
    info = ThInfo()
    tc = ThComment()
    _dec.th_info_init(ctypes.byref(info))
    _dec.th_comment_init(ctypes.byref(tc))
    setup = ctypes.c_void_p()
    op = OggPacket()
    for h in headers:
        arr = (ctypes.c_ubyte * len(h)).from_buffer_copy(h)
        op.packet = ctypes.cast(arr, ctypes.POINTER(ctypes.c_ubyte))
        op.bytes = len(h)
        op.b_o_s = 1 if h is headers[0] else 0
        r = _dec.th_decode_headerin(ctypes.byref(info),
                                    ctypes.byref(tc),
                                    ctypes.byref(setup),
                                    ctypes.byref(op))
        if r < 0:
            return None
    _dec.th_decode_alloc.restype = ctypes.c_void_p
    ctx = ctypes.c_void_p(_dec.th_decode_alloc(ctypes.byref(info),
                                               setup))
    if not ctx:
        return None
    _dec.th_setup_free(setup)
    frames = []
    gp = ctypes.c_int64()
    for p in packets:
        arr = (ctypes.c_ubyte * len(p)).from_buffer_copy(p)
        op.packet = ctypes.cast(arr, ctypes.POINTER(ctypes.c_ubyte))
        op.bytes = len(p)
        op.b_o_s = 0
        r = _dec.th_decode_packetin(ctx, ctypes.byref(op),
                                    ctypes.byref(gp))
        if r < 0:
            continue
        buf = ThYCbCr()
        if _dec.th_decode_ycbcr_out(ctx, buf) != 0:
            continue
        planes = []
        for i in range(3):
            pl = buf[i]
            rows = []
            for yy in range(pl.height):
                rows.append(np.ctypeslib.as_array(
                    ctypes.cast(
                        ctypes.addressof(pl.data.contents)
                        + yy * pl.stride,
                        ctypes.POINTER(ctypes.c_ubyte)),
                    shape=(pl.width,)).copy())
            planes.append(np.stack(rows))
        frames.append(tuple(planes))
    _dec.th_decode_free(ctx)
    _dec.th_comment_clear(ctypes.byref(tc))
    _dec.th_info_clear(ctypes.byref(info))
    return frames, info
