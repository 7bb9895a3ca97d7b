"""xingmux header generation + apedemux tag stripping."""

import struct

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.audioparsers import mp3_frame_info
from gstreamer_tpu.elements.xingmux import _xing_offset
from tests.test_audioparsers import make_mp3_frame


class TestXingMux:
    def _mux(self, frames):
        p = parse_launch(
            "appsrc name=in ! application/octet-stream ! "
            "mpegaudioparse ! xingmux ! appsink name=out")
        src = p.get_by_name("in")
        src.push_buffer(Buffer(
            data=np.frombuffer(b"".join(frames), np.uint8)))
        src.end_of_stream()
        p.run()
        out = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            blobs = s.buffer.data if isinstance(s.buffer.data, list) \
                else list(s.buffer.data)
            out.extend(
                bytes(b) if isinstance(b, (bytes, bytearray))
                else np.asarray(b).tobytes() for b in blobs)
        return out

    def test_header_prepended(self):
        frames = [make_mp3_frame(fill=k)[0] for k in range(20)]
        out = self._mux(frames)
        assert len(out) == 21
        hdr = out[0]
        # valid mp3 frame with Xing marker at the right offset
        assert mp3_frame_info(hdr[:4]) is not None
        off = 4 + _xing_offset(hdr[:4])
        assert hdr[off:off + 4] == b"Xing"
        flags = struct.unpack(">I", hdr[off + 4:off + 8])[0]
        assert flags & 1 and flags & 2 and flags & 4
        n_frames = struct.unpack(">I", hdr[off + 8:off + 12])[0]
        assert n_frames == 21
        n_bytes = struct.unpack(">I", hdr[off + 12:off + 16])[0]
        assert n_bytes == sum(len(f) for f in out)
        # music frames pass through unchanged
        assert out[1:] == frames

    def test_toc_monotonic(self):
        frames = [make_mp3_frame()[0] for _ in range(50)]
        hdr = self._mux(frames)[0]
        off = 4 + _xing_offset(hdr[:4])
        toc = hdr[off + 16:off + 116]
        assert list(toc) == sorted(toc)
        assert toc[0] == 0


class TestApeDemux:
    def test_footer_tag_stripped(self, tmp_path):
        payload = b"MUSICDATA" * 100
        items = b""
        for k, v in ((b"Title", b"Hi"), (b"Artist", b"Me")):
            items += struct.pack("<II", len(v), 0) + k + b"\0" + v
        size = len(items) + 32
        footer = (b"APETAGEX" + struct.pack("<IIII", 2000, size, 2, 0)
                  + b"\0" * 8)
        f = tmp_path / "t.ape"
        f.write_bytes(payload + items + footer)
        p = parse_launch(f"apedemux location={f} ! appsink name=out")
        p.run()
        got = np.asarray(
            p.get_by_name("out").pull_sample().buffer.data).tobytes()
        assert got == payload
        tags = None
        while (m := p.bus.pop()) is not None:
            if m.type == "tag":
                tags = m.data
        assert tags == {"title": "Hi", "artist": "Me"}
