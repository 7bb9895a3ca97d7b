"""h264parse SPS parsing + AU framing, mpegvideoparse."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.videoparsers import (_BitR, _rbsp,
                                                 parse_sps)


class _BitW:
    def __init__(self):
        self.bits = []

    def u(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v):
        k = v + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)

    def bytes(self):
        bits = self.bits + [0] * ((-len(self.bits)) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        return bytes(out)


def make_sps(width_mbs=40, height_mbs=30, profile=66, crop=None):
    """Build a baseline SPS NAL for (width_mbs*16 x height_mbs*16)."""
    w = _BitW()
    w.u(profile, 8)
    w.u(0, 8)
    w.u(31, 8)                     # level 3.1
    w.ue(0)                        # sps id
    w.ue(4)                        # log2_max_frame_num_minus4
    w.ue(0)                        # poc type 0
    w.ue(4)                        # log2_max_poc
    w.ue(1)                        # max refs
    w.u(0, 1)                      # gaps
    w.ue(width_mbs - 1)
    w.ue(height_mbs - 1)
    w.u(1, 1)                      # frame_mbs_only
    w.u(0, 1)                      # direct_8x8
    if crop:
        w.u(1, 1)
        for c in crop:
            w.ue(c)
    else:
        w.u(0, 1)
    w.u(0, 1)                      # vui
    w.u(1, 1)                      # rbsp stop bit
    return bytes([0x67]) + w.bytes()


def make_slice(first_mb=0, idr=False):
    w = _BitW()
    w.ue(first_mb)
    w.ue(7 if idr else 5)          # slice_type (I)
    w.ue(0)                        # pps id
    w.u(0x5555, 16)                # frame_num etc (opaque filler)
    body = w.bytes()
    return bytes([0x65 if idr else 0x61]) + body + b"\x80"


SC = b"\x00\x00\x01"


class TestSps:
    def test_dimensions(self):
        sps = make_sps(40, 30)
        info = parse_sps(sps)
        assert info["width"] == 640 and info["height"] == 480
        assert info["profile"] == "baseline"

    def test_cropping(self):
        # 1920x1088 -> crop_bottom 4 (4*2 = 8 rows) = 1080
        sps = make_sps(120, 68, crop=(0, 0, 0, 4))
        info = parse_sps(sps)
        assert info["width"] == 1920 and info["height"] == 1080

    def test_emulation_prevention(self):
        assert _rbsp(b"\x00\x00\x03\x01") == b"\x00\x00\x01"
        assert _rbsp(b"\x12\x34") == b"\x12\x34"


class TestH264Parse:
    def test_au_framing(self):
        sps = make_sps()
        aus = []
        for k in range(4):
            au = SC + sps + SC + make_slice(0, idr=(k == 0))
            aus.append(au)
        blob = b"".join(aus)
        p = parse_launch(
            "appsrc name=in ! application/octet-stream ! h264parse ! "
            "appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(blob, np.uint8)))
        p.get_by_name("in").end_of_stream()
        p.run()
        got = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            d = s.buffer.data
            d = d if isinstance(d, list) else [
                np.asarray(d)[k] for k in range(s.buffer.batch)]
            got.extend(np.asarray(x).tobytes() for x in d)
        assert got == aus

    def test_sps_populates_info(self):
        from gstreamer_tpu.core.element import element_factory_make
        el = element_factory_make("h264parse")
        el.start()
        blob = (SC + make_sps(8, 6) + SC + make_slice(0)
                + SC + make_slice(0))
        el.handle_frame(np.frombuffer(blob, np.uint8))
        assert el.sps["width"] == 128 and el.sps["height"] == 96


class TestMpegVideoParse:
    def _seq_header(self, w, h, fps_code=3):
        return (b"\x00\x00\x01\xb3"
                + bytes([(w >> 4) & 0xFF,
                         ((w & 0xF) << 4) | ((h >> 8) & 0xF),
                         h & 0xFF, 0x10 | fps_code])
                + b"\x00\x00\x00\x00")

    def _picture(self, fill):
        return b"\x00\x00\x01\x00" + bytes([fill]) * 16

    def test_framing_and_info(self):
        seq = self._seq_header(352, 288)
        frames = [seq + self._picture(1), self._picture(2),
                  self._picture(3)]
        blob = b"".join(frames)
        p = parse_launch(
            "appsrc name=in ! application/octet-stream ! "
            "mpegvideoparse ! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(blob, np.uint8)))
        p.get_by_name("in").end_of_stream()
        p.run()
        got = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            d = s.buffer.data
            d = d if isinstance(d, list) else [
                np.asarray(d)[k] for k in range(s.buffer.batch)]
            got.extend(np.asarray(x).tobytes() for x in d)
        assert got == frames
        el = [e for e in p.elements
              if e.FACTORY == "mpegvideoparse"][0]
        assert el.info["width"] == 352 and el.info["height"] == 288
        assert el.info["fps"] == (25, 1)
