"""multipartmux/multipartdemux roundtrip (MJPEG flavor) + id3demux."""

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.multipart import parse_multipart


class TestMultipart:
    def test_mux_format(self, tmp_path):
        path = tmp_path / "m.mjpeg"
        p = parse_launch(
            f"videotestsrc num-buffers=3 ! "
            f"video/x-raw,format=I420,width=32,height=24 ! jpegenc ! "
            f"multipartmux ! filesink location={path}")
        p.run()
        p.set_state("null")
        blob = open(path, "rb").read()
        assert blob.startswith(b"--ThisRandomString\r\n")
        boundary, parts = parse_multipart(blob)
        assert boundary == "ThisRandomString"
        assert len(parts) == 3
        for mime, payload in parts:
            assert mime == "image/jpeg"
            assert payload[:2] == b"\xff\xd8"    # SOI marker

    def test_demux_decode_roundtrip(self, tmp_path):
        path = tmp_path / "m.mjpeg"
        p = parse_launch(
            f"videotestsrc num-buffers=4 pattern=gradient ! "
            f"video/x-raw,format=I420,width=48,height=32 ! jpegenc ! "
            f"multipartmux boundary=abc ! filesink location={path}")
        p.run()
        p.set_state("null")
        d = parse_launch(
            f"multipartdemux location={path} ! jpegdec ! "
            f"appsink name=out")
        d.run()
        n = 0
        while (s := d.get_by_name("out").pull_sample()) is not None:
            y = np.asarray(s.buffer.data[0])
            n += y.shape[0]
            assert y.shape[-2:] == (32, 48)
        assert n == 4

    def test_custom_boundary(self, tmp_path):
        path = tmp_path / "b.mp"
        p = parse_launch(
            f"videotestsrc num-buffers=1 ! "
            f"video/x-raw,format=I420,width=16,height=16 ! jpegenc ! "
            f"multipartmux boundary=XYZ ! filesink location={path}")
        p.run()
        p.set_state("null")
        blob = open(path, "rb").read()
        assert blob.startswith(b"--XYZ\r\n")


class TestId3Demux:
    def _make_tagged_wav(self, tmp_path):
        wav = tmp_path / "t.wav"
        p = parse_launch(
            f"audiotestsrc num-buffers=2 samplesperbuffer=400 ! "
            f"audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            f"wavenc location={wav}")
        p.run()
        p.set_state("null")
        payload = open(wav, "rb").read()
        # minimal ID3v2.3 tag with TIT2
        title = "Hi".encode()
        frame = b"TIT2" + (len(title) + 1).to_bytes(4, "big") \
            + b"\0\0" + b"\x00" + title
        tag_size = len(frame)
        hdr = b"ID3\x03\x00\x00" + bytes(
            [(tag_size >> 21) & 0x7F, (tag_size >> 14) & 0x7F,
             (tag_size >> 7) & 0x7F, tag_size & 0x7F])
        tagged = tmp_path / "tagged.wav"
        tagged.write_bytes(hdr + frame + payload)
        return tagged, payload

    def test_strips_tag_and_posts(self, tmp_path):
        tagged, payload = self._make_tagged_wav(tmp_path)
        p = parse_launch(
            f"id3demux location={tagged} ! appsink name=out")
        p.run()
        s = p.get_by_name("out").pull_sample()
        got = np.asarray(s.buffer.data).tobytes()
        assert got == payload
        tag_msgs = []
        while (m := p.bus.pop()) is not None:
            if m.type == "tag":
                tag_msgs.append(m.data)
        assert tag_msgs and "title" in tag_msgs[0]
        assert tag_msgs[0]["title"] == ["Hi"]
