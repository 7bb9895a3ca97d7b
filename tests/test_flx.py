"""FLIC decoder: synthetic-stream golds for every chunk type."""

import struct

import numpy as np
import pytest

from gstreamer_tpu.codecs import flic
from gstreamer_tpu.core.parse import parse_launch


def _header(w, h, nframes, magic=flic.FLC_MAGIC, speed=100):
    hdr = bytearray(128)
    struct.pack_into("<IHHHHHHI", hdr, 0, 0, magic, nframes, w, h, 8,
                     0, speed)
    return hdr


def _frame(*chunks):
    body = b""
    for ctype, payload in chunks:
        csize = 6 + len(payload)
        body += struct.pack("<IH", csize, ctype) + payload
        if csize & 1:
            body += b"\0"
    frame = struct.pack("<IHH", 16 + len(body), flic.FRAME_TYPE,
                        len(chunks)) + b"\0" * 8 + body
    return frame


def _color256(entries):
    # one pack starting at index 0
    payload = struct.pack("<H", 1) + bytes([0, len(entries) % 256])
    for r, g, b in entries:
        payload += bytes([r, g, b])
    return (flic.COLOR256, payload)


def _brun(frame_rows):
    # literal-encode every row (count = -width)
    payload = b""
    for row in frame_rows:
        payload += b"\x01"           # legacy packet count
        w = len(row)
        pos = 0
        while pos < w:
            n = min(127, w - pos)
            payload += struct.pack("b", -n) + bytes(row[pos:pos + n])
            pos += n
    return (flic.BRUN, payload)


class TestFlicDecode:
    def test_brun_keyframe_and_palette(self):
        w, h = 8, 4
        img = [[(x + y) % 4 for x in range(w)] for y in range(h)]
        pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 8, 9)]
        data = bytes(_header(w, h, 1)) + _frame(_color256(pal),
                                                _brun(img))
        frames, palettes, speed, (gw, gh) = flic.decode(data)
        assert (gw, gh) == (w, h)
        np.testing.assert_array_equal(frames[0], np.array(img))
        np.testing.assert_array_equal(palettes[0][:4],
                                      np.array(pal))

    def test_black_and_fli_delta(self):
        w, h = 6, 3
        # frame1: black; frame2: FLI delta sets row 1 to literal bytes
        delta = struct.pack("<HH", 1, 1)     # start_line=1, lines=1
        delta += bytes([1])                  # 1 packet
        delta += bytes([2])                  # skip 2
        delta += struct.pack("b", 3)         # literal count 3
        delta += bytes([9, 8, 7])
        data = (bytes(_header(w, h, 2))
                + _frame((flic.BLACK, b""))
                + _frame((flic.LC, delta)))
        frames, _, _, _ = flic.decode(data)
        assert (frames[0] == 0).all()
        want = np.zeros((h, w), np.uint8)
        want[1, 2:5] = [9, 8, 7]
        np.testing.assert_array_equal(frames[1], want)

    def test_fli_delta_fill_run(self):
        w, h = 6, 2
        delta = struct.pack("<HH", 0, 1)
        delta += bytes([1, 0]) + struct.pack("b", -4) + bytes([5])
        data = (bytes(_header(w, h, 2))
                + _frame((flic.BLACK, b""))
                + _frame((flic.LC, delta)))
        frames, _, _, _ = flic.decode(data)
        want = np.zeros((h, w), np.uint8)
        want[0, :4] = 5
        np.testing.assert_array_equal(frames[1], want)

    def test_ss2_word_delta(self):
        w, h = 6, 3
        # one line (line 0): 1 packet: skip 0, literal 2 words
        delta = struct.pack("<H", 1)
        delta += struct.pack("<H", 1)        # packet-count opcode
        delta += bytes([0]) + struct.pack("b", 2)
        delta += bytes([1, 2, 3, 4])
        data = (bytes(_header(w, h, 2))
                + _frame((flic.BLACK, b""))
                + _frame((flic.SS2, delta)))
        frames, _, _, _ = flic.decode(data)
        want = np.zeros((h, w), np.uint8)
        want[0, :4] = [1, 2, 3, 4]
        np.testing.assert_array_equal(frames[1], want)

    def test_copy_chunk(self):
        w, h = 4, 2
        raw = bytes(range(8))
        data = bytes(_header(w, h, 1)) + _frame((flic.COPY, raw))
        frames, _, _, _ = flic.decode(data)
        np.testing.assert_array_equal(
            frames[0], np.arange(8, dtype=np.uint8).reshape(2, 4))

    def test_bad_magic_rejected(self):
        with pytest.raises(ValueError):
            flic.decode(bytes(_header(4, 4, 0, magic=0x1234)))


class TestFlxDecElement:
    def test_pipeline(self, tmp_path):
        w, h = 8, 4
        img = [[1] * w for _ in range(h)]
        pal = [(0, 0, 0), (10, 20, 30)]
        data = (bytes(_header(w, h, 2, speed=50))
                + _frame(_color256(pal), _brun(img))
                + _frame())
        f = tmp_path / "a.flc"
        f.write_bytes(data)
        p = parse_launch(f"flxdec location={f} ! appsink name=out")
        p.run()
        n = 0
        while (s := p.get_by_name("out").pull_sample()) is not None:
            caps = s.caps[0]
            assert (caps["width"], caps["height"]) == (w, h)
            fr = caps["framerate"]
            assert (fr.num, fr.denom) == (1000, 50) or \
                (fr.num / fr.denom) == 20.0
            r = np.asarray(s.buffer.data[0])
            n += r.shape[0]
            assert (r == 10).all()
        assert n == 2
