"""jpegparse / jifmux / ivfparse (reference
gst-plugins-bad/gst/jpegformat/, gst/ivfparse/)."""

import struct

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.jpegformat import (
    build_exif_app1, parse_sof, walk_markers)


def _encode_jpeg(w=64, h=48):
    p = parse_launch(
        f"videotestsrc num-buffers=1 ! video/x-raw,format=I420,"
        f"width={w},height={h} ! jpegenc ! appsink name=out")
    p.run()
    s = p.get_by_name("out").pull_sample()
    d = s.buffer.data
    d = d[0] if isinstance(d, (list, tuple)) else d
    return np.asarray(d).tobytes()


def _mk_ivf(fourcc=b"VP80", w=32, h=24, frames=3):
    hdr = b"DKIF" + struct.pack("<HH4sHHIIII", 0, 32, fourcc, w, h,
                                30, 1, frames, 0)
    out = bytearray(hdr)
    payloads = []
    for k in range(frames):
        if fourcc == b"VP80":
            # interframe tag (bit0=1) so no resolution re-parse
            body = bytes([0x01, 0x02, 0x03]) + bytes(range(20))
        else:
            body = bytes([k]) * 24
        payloads.append(body)
        out += struct.pack("<IQ", len(body), k) + body
    return bytes(out), payloads


class TestJpegParse:
    def test_walk_markers_roundtrip(self):
        blob = _encode_jpeg()
        markers, scan, complete = walk_markers(blob)
        assert complete and scan is not None
        kinds = [m for m, _, _ in markers]
        assert 0xD8 in kinds and 0xDA in kinds and 0xD9 in kinds
        sof = [p for m, _, p in markers if m == 0xC0]
        assert sof
        info = parse_sof(sof[0])
        assert (info["width"], info["height"]) == (64, 48)
        assert len(info["components"]) == 3

    def test_parse_pipeline_caps(self):
        blob = _encode_jpeg(48, 32)
        p = parse_launch("appsrc name=in ! image/jpeg ! jpegparse "
                         "! appsink name=out")
        p.get_by_name("in").push_buffer(
            Buffer(data=np.frombuffer(blob * 3, np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        sink = p.get_by_name("out")
        n = 0
        while (s := sink.pull_sample()) is not None:
            st = s.caps[0]
            assert st.name == "image/jpeg"
            assert st["width"] == 48 and st["height"] == 32
            assert st["parsed"] is True
            assert st["sampling"].startswith("YCbCr")
            d = s.buffer.data
            d = d[0] if isinstance(d, (list, tuple)) else d
            raw = np.asarray(d).tobytes()
            n += raw.count(b"\xff\xd8")
        assert n == 3


class TestJifMux:
    def test_passthrough_structure(self, tmp_path):
        blob = _encode_jpeg()
        p = parse_launch("appsrc name=in ! image/jpeg ! jifmux "
                         "! appsink name=out")
        p.get_by_name("in").push_buffer(
            Buffer(data=np.frombuffer(blob, np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        d = s.buffer.data
        raw = np.asarray(d[0] if isinstance(d, (list, tuple))
                         else d).tobytes()
        assert raw[:2] == b"\xff\xd8" and raw[-2:] == b"\xff\xd9"
        # still decodable
        f = tmp_path / "m_0.jpg"
        f.write_bytes(raw)
        p2 = parse_launch(
            f"multifilesrc location={tmp_path}/m_%d.jpg ! jpegdec "
            f"! appsink name=out")
        p2.run()
        assert p2.get_by_name("out").pull_sample() is not None

    def test_tags_inserted(self):
        blob = _encode_jpeg()
        p = parse_launch(
            'appsrc name=in ! image/jpeg ! '
            'taginject tags=comment=hello-goom,artist=me ! jifmux '
            '! appsink name=out')
        p.get_by_name("in").push_buffer(
            Buffer(data=np.frombuffer(blob, np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        d = s.buffer.data
        raw = np.asarray(d[0] if isinstance(d, (list, tuple))
                         else d).tobytes()
        assert b"Exif\x00\x00II*\x00" in raw       # EXIF APP1
        assert b"hello-goom" in raw                # COM + XMP
        assert b"http://ns.adobe.com/xap/1.0/" in raw
        # COM precedes SOF
        assert raw.find(b"hello-goom") < raw.find(b"\xff\xc0")

    def test_exif_builder(self):
        exif = build_exif_app1({"artist": "someone",
                                "description": "d"})
        assert exif.startswith(b"Exif\0\0II*\0")
        assert b"someone\0" in exif
        assert exif is not None
        assert build_exif_app1({}) is None


class TestIvfParse:
    @pytest.mark.parametrize("fourcc,media", [
        (b"VP80", "video/x-vp8"), (b"VP90", "video/x-vp9"),
        (b"AV01", "video/x-av1")])
    def test_frames_and_caps(self, fourcc, media):
        blob, payloads = _mk_ivf(fourcc)
        p = parse_launch("appsrc name=in ! video/x-ivf ! ivfparse "
                         "! appsink name=out")
        p.get_by_name("in").push_buffer(
            Buffer(data=np.frombuffer(blob, np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        sink = p.get_by_name("out")
        got = []
        while (s := sink.pull_sample()) is not None:
            st = s.caps[0]
            assert st.name == media
            assert st["width"] == 32 and st["height"] == 24
            fr = st["framerate"]
            assert (fr.num, fr.denom) == (30, 1)
            if media == "video/x-av1":
                assert st["alignment"] == "tu"
            d = s.buffer.data
            for b in (d if isinstance(d, (list, tuple)) else [d]):
                got.append(np.asarray(b).tobytes())
        assert got == payloads

    def test_vp8_keyframe_resolution(self):
        # key frame (tag bit0 = 0) carries 14-bit w/h at offset 6/8
        hdr = b"DKIF" + struct.pack("<HH4sHHIIII", 0, 32, b"VP80",
                                    32, 24, 30, 1, 1, 0)
        body = bytearray(10)
        body[0:3] = (0).to_bytes(3, "little")       # keyframe tag
        body[6:8] = struct.pack("<H", 100)
        body[8:10] = struct.pack("<H", 80)
        blob = hdr + struct.pack("<IQ", len(body), 0) + bytes(body)
        p = parse_launch("appsrc name=in ! video/x-ivf ! ivfparse "
                         "! appsink name=out")
        p.get_by_name("in").push_buffer(
            Buffer(data=np.frombuffer(blob, np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        st = s.caps[0]
        assert st["width"] == 100 and st["height"] == 80

    def test_bad_magic_rejected(self):
        blob = b"XXXX" + bytes(40)
        p = parse_launch("appsrc name=in ! video/x-ivf ! ivfparse "
                         "! appsink name=out")
        p.get_by_name("in").push_buffer(
            Buffer(data=np.frombuffer(blob, np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        with pytest.raises(ValueError):
            p.run()
