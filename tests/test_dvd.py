"""DVD elements (gstdvdlpcmdec.c / gstdvdsubdec.c / gstdvdspu.c):
LPCM unpacking, SPU RLE decode, subpicture overlay."""

import struct

import numpy as np

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.element import element_factory_make
from gstreamer_tpu.elements.dvd import decode_spu


class TestLpcm:
    def test_16bit_private1(self):
        dec = element_factory_make("dvdlpcmdec")
        samples = np.array([[1000, -1000], [32000, -32000],
                            [0, 1]], np.int16)
        payload = samples.astype(">i2").tobytes()
        # private1 header: frame count, 2-byte 1st access unit,
        # audio info (quant=16bit, 48k, 2ch), dyn range
        hdr = bytes([1, 0, 4, (0 << 6) | (0 << 4) | 1, 0x80])
        from gstreamer_tpu.core.caps import Caps
        dec.set_info(Caps.from_string("audio/x-private1-lpcm"), None)
        out = dec.host_process(Buffer(
            data=np.frombuffer(hdr + payload, np.uint8), batch=1))
        got = np.asarray(out.data)
        assert got.shape == (3, 2)
        assert np.array_equal(got, samples)
        assert dec._rate == 48000 and dec._width == 16

    def test_24bit_group_unpack(self):
        dec = element_factory_make("dvdlpcmdec")
        from gstreamer_tpu.core.caps import Caps
        dec.set_info(Caps.from_string("audio/x-private1-lpcm"), None)
        # 1 channel, 24-bit: group = two samples 16-bit MSBs + 2 LSBs
        s1, s2 = 0x123456, -0x123456
        def msb(v): return struct.pack(">h", v >> 8)
        def lsb(v): return bytes([v & 0xFF])
        group = msb(s1) + msb(s2) + lsb(s1) + lsb(s2 & 0xFFFFFF)
        hdr = bytes([1, 0, 4, (2 << 6) | (0 << 4) | 0, 0x80])
        out = dec.host_process(Buffer(
            data=np.frombuffer(hdr + group, np.uint8), batch=1))
        got = np.asarray(out.data).ravel()
        assert got[0] == s1 >> 8
        assert got[1] == s2 >> 8


def _make_spu(w=8, h=4, color=1, alpha=15):
    """Craft a minimal SPU packet: solid color rectangle."""
    # RLE line: one run covering the full line: 16-bit code run<<2|c
    # use run=0 (fill line): nibbles 0,0,0,color
    line = bytes([0x00, color & 0x3])
    top = b"".join([line] * ((h + 1) // 2))
    bot = b"".join([line] * (h // 2))
    pxd = top + bot
    pxd_off = 4
    top_off = pxd_off
    bot_off = pxd_off + len(top)
    ctrl_off = pxd_off + len(pxd)
    ctrl = struct.pack(">HH", 0, ctrl_off)    # delay, next == self
    ctrl += bytes([0x01])                      # start display
    ctrl += bytes([0x03, 0x32, 0x10])          # SET_COLOR
    a = alpha & 0xF
    ctrl += bytes([0x04, (a << 4) | a, (a << 4) | a])  # SET_CONTR
    sx, sy = 16, 20
    ex, ey = sx + w - 1, sy + h - 1
    ctrl += bytes([0x05, sx >> 4, ((sx & 0xF) << 4) | (ex >> 8),
                   ex & 0xFF, sy >> 4, ((sy & 0xF) << 4) | (ey >> 8),
                   ey & 0xFF])
    ctrl += bytes([0x06]) + struct.pack(">HH", top_off, bot_off)
    ctrl += bytes([0xFF])
    body = pxd + ctrl
    size = 4 + len(body)
    return struct.pack(">HH", size, ctrl_off) + body


class TestSpu:
    def test_decode_solid_rect(self):
        spu = decode_spu(_make_spu(w=8, h=4, color=1))
        assert spu is not None
        assert spu["x"] == 16 and spu["y"] == 20
        img = spu["image"]
        assert img.shape == (4, 8, 4)
        assert np.all(img[..., 0] == 255)       # fully opaque
        assert len(np.unique(img[..., 1])) == 1  # solid colour

    def test_dvdsubdec_element(self):
        dec = element_factory_make("dvdsubdec")
        out = dec.host_process(Buffer(
            data=np.frombuffer(_make_spu(), np.uint8), batch=1))
        img = np.asarray(out.data)
        assert img.shape == (1, 4, 4, 8)         # (batch, AYUV, h, w)
        assert dec.last_region == (16, 20)


class TestDvdSpu:
    def test_overlay_blend(self):
        spu = element_factory_make("dvdspu", x=4, y=2)
        video = Buffer(data=(
            np.zeros((1, 16, 16), np.uint8),
            np.full((1, 8, 8), 128, np.uint8),
            np.full((1, 8, 8), 128, np.uint8)), batch=1)
        img = np.zeros((4, 4, 8), np.uint8)     # AYUV planes
        img[0] = 255                             # opaque
        img[1] = 200                             # bright luma
        img[2] = img[3] = 128
        sub = Buffer(data=img[None], batch=1)
        out = spu.host_aggregate({"video": video, "subpicture": sub})
        Y = np.asarray(out.data[0])[0]
        assert Y[2, 4] == 200                    # overlaid region
        assert Y[0, 0] == 0                      # untouched corner
