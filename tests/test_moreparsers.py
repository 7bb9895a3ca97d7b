"""Parser/tag batch: h263parse, h266parse, vc1parse, diracparse,
jpeg2000parse, oggparse, matroskaparse, vorbisparse/vorbistag,
flactag, id3metaparse, ssaparse, goom (reference gst/videoparsers/,
ext/ogg/, ext/vorbis/, ext/flac/, gst/subparse/)."""

import struct

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch


def _frames(caps, parser, payload):
    p = parse_launch(f"appsrc name=in ! {caps} ! {parser} ! "
                     f"appsink name=out")
    p.get_by_name("in").push_buffer(Buffer(
        data=np.frombuffer(payload, np.uint8), pts=0))
    p.get_by_name("in").end_of_stream()
    p.run()
    frames = []
    while (s := p.get_by_name("out").pull_sample()) is not None:
        d = s.buffer.data
        if isinstance(d, (list, tuple)):
            frames.extend(bytes(np.asarray(b).ravel()) for b in d)
        else:
            arr = np.asarray(d)
            if arr.ndim > 1:                     # batched equal-size
                frames.extend(bytes(r.tobytes()) for r in arr)
            else:
                frames.append(bytes(arr.tobytes()))
    return frames


# emulation-safe filler (no 00 00 pairs)
_F = bytes(range(1, 201))


class TestH263Parse:
    def test_splits_at_psc(self):
        pic = b"\x00\x00\x80\x02"
        stream = pic + _F[:50] + pic + _F[:60] + pic + _F[:70]
        frames = _frames("application/octet-stream", "h263parse",
                         stream)
        assert len(frames) == 3
        assert frames[0] == pic + _F[:50]
        assert frames[2] == pic + _F[:70]


class TestH266Parse:
    def test_au_split(self):
        sc = b"\x00\x00\x00\x01"
        # VVC NAL header: byte0 layer, byte1 = type<<3 | tid
        sps = bytes([0, 15 << 3]) + _F[:20]
        slice_ = bytes([0, 1 << 3]) + _F[:80]
        au = sc + sps + sc + slice_
        frames = _frames("application/octet-stream", "h266parse",
                         au + au)
        assert len(frames) == 2
        for f in frames:
            assert sps in f and slice_ in f


class TestVc1Parse:
    def test_frame_bdus(self):
        seq = b"\x00\x00\x01\x0f" + _F[:20]
        frame1 = b"\x00\x00\x01\x0d" + _F[:90]
        frame2 = b"\x00\x00\x01\x0d" + _F[:70]
        frames = _frames("application/octet-stream", "vc1parse",
                         seq + frame1 + frame2)
        assert len(frames) == 2
        assert frames[0] == seq + frame1
        assert frames[1] == frame2


class TestDiracParse:
    def _unit(self, code, body):
        total = 13 + len(body)
        return (b"BBCD" + bytes([code]) + struct.pack(">I", total)
                + struct.pack(">I", 0) + body)

    def test_parse_units(self):
        u1 = self._unit(0x00, _F[:40])           # sequence header
        u2 = self._unit(0x08, _F[:100])          # picture
        frames = _frames("application/octet-stream", "diracparse",
                         u1 + u2)
        assert frames == [u1, u2]


class TestJpeg2000Parse:
    def test_soc_to_eoc(self):
        cs = b"\xff\x4f\xff\x51" + _F[:80] + b"\xff\xd9"
        frames = _frames("application/octet-stream",
                         "jpeg2000parse", cs + cs)
        assert frames == [cs, cs]


class TestOggParse:
    def _page(self, seq, body):
        segs = [255] * (len(body) // 255) + [len(body) % 255]
        hdr = (b"OggS\x00\x00" + bytes(8) + b"\x01\x00\x00\x00"
               + struct.pack("<I", seq) + b"\x00\x00\x00\x00"
               + bytes([len(segs)]) + bytes(segs))
        return hdr + body

    def test_pages(self):
        p1 = self._page(0, _F[:100])
        p2 = self._page(1, _F[:180])
        frames = _frames("application/octet-stream", "oggparse",
                         p1 + p2)
        assert frames == [p1, p2]


class TestVorbis:
    def _ident(self, rate=44100, ch=2):
        return (b"\x01vorbis" + b"\x00\x00\x00\x00" + bytes([ch])
                + struct.pack("<I", rate) + bytes(16) + b"\x01")

    def _comments(self, vendor=b"ref", items=()):
        out = bytearray(b"\x03vorbis")
        out += struct.pack("<I", len(vendor)) + vendor
        out += struct.pack("<I", len(items))
        for c in items:
            out += struct.pack("<I", len(c)) + c
        out += b"\x01"
        return bytes(out)

    def test_vorbisparse_caps_probe(self):
        p = parse_launch("appsrc name=in ! audio/x-vorbis ! "
                         "vorbisparse name=vp ! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(self._ident(48000, 1), np.uint8),
            pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        vp = p.get_by_name("vp")
        assert vp.rate == 48000 and vp.channels == 1

    def test_vorbistag_rewrites_comments(self):
        p = parse_launch(
            "appsrc name=in ! audio/x-vorbis ! "
            "vorbistag tags=TITLE=New;ARTIST=Me ! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(
            data=[np.frombuffer(self._ident(), np.uint8),
                  np.frombuffer(self._comments(
                      items=[b"TITLE=Old"]), np.uint8)],
            pts=0, batch=2))
        p.get_by_name("in").end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        pkts = [bytes(np.asarray(b).ravel())
                for b in s.buffer.data]
        comment = [x for x in pkts if x[:7] == b"\x03vorbis"][0]
        assert b"TITLE=New" in comment and b"ARTIST=Me" in comment
        assert b"TITLE=Old" not in comment


class TestFlacTag:
    def _flac(self):
        # fLaC + STREAMINFO (type 0, 34 bytes) + VORBIS_COMMENT(last)
        si = bytes([0x00]) + (34).to_bytes(3, "big") + bytes(34)
        vc_body = (struct.pack("<I", 3) + b"old"
                   + struct.pack("<I", 1)
                   + struct.pack("<I", 9) + b"TITLE=Old")
        vc = bytes([0x84]) + len(vc_body).to_bytes(3, "big") + vc_body
        return b"fLaC" + si + vc + b"\xff\xf8AUDIO"

    def test_rewrite(self):
        frames = _frames("audio/x-flac", "flactag tags=TITLE=New",
                         self._flac())
        out = b"".join(frames)
        assert out[:4] == b"fLaC"
        assert b"TITLE=New" in out and b"TITLE=Old" not in out
        assert out.endswith(b"\xff\xf8AUDIO")    # frames untouched


class TestId3MetaParse:
    def test_strip_and_surface(self):
        # minimal ID3v2.3 tag with one TIT2 frame
        title = b"\x00Hello"
        frame = b"TIT2" + struct.pack(">I", len(title)) + b"\x00\x00" \
            + title
        size = len(frame)
        syncsafe = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                          (size >> 7) & 0x7F, size & 0x7F])
        tag = b"ID3\x03\x00\x00" + syncsafe + frame
        rest = b"\xff\xfbAUDIOFRAME"
        frames = _frames("application/octet-stream", "id3metaparse",
                         tag + rest)
        assert b"".join(frames) == rest


class TestSsaParse:
    def test_dialogue_extraction(self):
        ssa = ("[Events]\n"
               "Format: Layer, Start, End, Style, Name, MarginL, "
               "MarginR, MarginV, Effect, Text\n"
               "Dialogue: 0,0:00:01.00,0:00:03.00,Default,,0,0,0,,"
               "{\\i1}Hello{\\i0} world\\Nbye\n").encode()
        frames = _frames("application/x-ssa", "ssaparse", ssa)
        assert frames == [b"Hello world\nbye"]


class TestGoomAlias:
    def test_runs(self):
        p = parse_launch(
            "audiotestsrc num-buffers=6 samplesperbuffer=1764 "
            "wave=ticks ! audio/x-raw,format=S16LE,rate=44100,"
            "channels=2 ! goom seed=1 ! video/x-raw,width=64,"
            "height=48 ! appsink name=out")
        p.run()
        s = p.get_by_name("out").pull_sample()
        assert s is not None
