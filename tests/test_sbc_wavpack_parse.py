"""sbcparse / wavpackparse (reference
gst-plugins-good/gst/audioparsers/gstsbcparse.c, gstwavpackparse.c)."""

import struct

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.audioparsers import (
    sbc_calc_framelen, sbc_crc8, sbc_parse_header, wvpk_header)


def mk_sbc_frame(rate_i=2, blocks_i=1, mode=0, alloc=0, subbands8=True,
                 bitpool=32, fill=0x55):
    """Build a structurally valid SBC frame with correct header CRC."""
    byte1 = (rate_i << 6) | (blocks_i << 4) | (mode << 2) \
        | (alloc << 1) | (1 if subbands8 else 0)
    subbands = 8 if subbands8 else 4
    blocks = (4, 8, 12, 16)[blocks_i]
    flen = sbc_calc_framelen(subbands, mode, blocks, bitpool)
    frame = bytearray(flen)
    frame[0] = 0x9C
    frame[1] = byte1
    frame[2] = bitpool
    for i in range(4, flen):
        frame[i] = fill
    crc_bits = 16 + (subbands if mode == 3 else 0) \
        + subbands * (1 if mode == 0 else 2) * 4
    crc_data = bytearray(11)
    crc_data[0] = frame[1]
    crc_data[1] = frame[2]
    i = 16
    while i < crc_bits:
        crc_data[i // 8] = frame[1 + (i // 8) + 1]
        i += 8
    if i > crc_bits:
        crc_data[(i // 8) - 1] &= 0xF0
    frame[3] = sbc_crc8(bytes(crc_data), crc_bits)
    return bytes(frame)


def mk_wvpk_block(samples=3000, flags_extra=0x1000, idx=0, size=64):
    body = bytes(size)
    flags = (9 << 23) | flags_extra      # rate idx 9 = 44100, stereo
    hdr = b"wvpk" + struct.pack("<IHBBIIIII", 24 + size, 0x410, 0, 0,
                                samples * 4, idx * samples, samples,
                                flags, 0xDEAD)
    return hdr + body


class TestSbcHelpers:
    def test_framelen_modes(self):
        # gst_sbc_calc_framelen transliteration
        assert sbc_calc_framelen(4, 0, 4, 2) == 4 + 2 + 1
        assert sbc_calc_framelen(8, 0, 16, 32) == 4 + 4 + 64
        assert sbc_calc_framelen(8, 2, 16, 32) == 4 + 8 + 64
        assert sbc_calc_framelen(8, 3, 16, 32) == 4 + 8 + (8 + 512 + 7) // 8

    def test_header_roundtrip(self):
        f = mk_sbc_frame(rate_i=3, blocks_i=3, mode=2, bitpool=40)
        h = sbc_parse_header(f)
        assert h is not None
        assert h["rate"] == 48000 and h["blocks"] == 16
        assert h["mode"] == 2 and h["bitpool"] == 40
        assert h["frame_len"] == len(f)

    def test_crc_rejects_corruption(self):
        f = bytearray(mk_sbc_frame())
        f[3] ^= 0xFF
        assert sbc_parse_header(bytes(f)) is None

    def test_bad_sync_rejected(self):
        assert sbc_parse_header(b"\x00" * 16) is None


class TestSbcElement:
    def test_frames_and_caps(self):
        frames = [mk_sbc_frame(fill=k) for k in range(6)]
        blob = b"garbage" + b"".join(frames)
        p = parse_launch("appsrc name=in ! audio/x-sbc ! sbcparse "
                         "! appsink name=out")
        p.get_by_name("in").push_buffer(
            Buffer(data=np.frombuffer(blob, np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        sink = p.get_by_name("out")
        got = []
        caps = None
        while (s := sink.pull_sample()) is not None:
            caps = s.caps
            d = s.buffer.data
            arr = np.asarray(d if not isinstance(d, (list, tuple))
                             else d[0])
            if arr.ndim > 1:
                got.extend(bytes(r.tobytes()) for r in arr)
            else:
                got.append(arr.tobytes())
        assert got == frames
        st = caps[0]
        assert st.name == "audio/x-sbc"
        assert st["rate"] == 44100 and st["channels"] == 1
        assert st["channel-mode"] == "mono"
        assert st["subbands"] == 8 and st["blocks"] == 8
        assert st["allocation-method"] == "loudness"
        assert st["parsed"] is True


class TestWavpack:
    def test_header_fields(self):
        h = wvpk_header(mk_wvpk_block())
        assert h["rate"] == 44100 and h["channels"] == 2
        assert h["block_samples"] == 3000 and h["final"]
        assert h["width"] == 8

    def test_element_frames(self):
        blocks = [mk_wvpk_block(idx=k) for k in range(4)]
        blob = b"xx" + b"".join(blocks)
        p = parse_launch("appsrc name=in ! audio/x-wavpack ! "
                         "wavpackparse ! appsink name=out")
        p.get_by_name("in").push_buffer(
            Buffer(data=np.frombuffer(blob, np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        sink = p.get_by_name("out")
        got = []
        caps = None
        while (s := sink.pull_sample()) is not None:
            caps = s.caps
            d = s.buffer.data
            arr = np.asarray(d if not isinstance(d, (list, tuple))
                             else d[0])
            if arr.ndim > 1:
                got.extend(bytes(r.tobytes()) for r in arr)
            else:
                got.append(arr.tobytes())
        assert got == blocks
        st = caps[0]
        assert st.name == "audio/x-wavpack"
        assert st["rate"] == 44100 and st["framed"] is True

    def test_multiblock_segment(self):
        # non-final + final block = ONE frame
        b1 = mk_wvpk_block(flags_extra=0x0800)       # initial, not final
        b2 = mk_wvpk_block(flags_extra=0x1000)
        p = parse_launch("appsrc name=in ! audio/x-wavpack ! "
                         "wavpackparse ! appsink name=out")
        p.get_by_name("in").push_buffer(
            Buffer(data=np.frombuffer(b1 + b2, np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        d = s.buffer.data
        arr = np.asarray(d if not isinstance(d, (list, tuple)) else d[0])
        raw = arr.tobytes() if arr.ndim == 1 else arr[0].tobytes()
        assert raw == b1 + b2
        assert p.get_by_name("out").pull_sample() is None
