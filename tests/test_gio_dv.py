"""giostreamsrc/giostreamsink (gst/gio/) and dvdemux (ext/dv/)."""

import io

import numpy as np

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch


class TestGioStreams:
    def test_src_reads_filelike(self):
        payload = bytes(range(256)) * 4
        p = parse_launch("giostreamsrc name=s ! "
                         "application/octet-stream ! appsink name=o")
        p.get_by_name("s").props["stream"] = io.BytesIO(payload)
        p.run()
        out = bytearray()
        while (s := p.get_by_name("o").pull_sample()) is not None:
            out += bytes(np.asarray(s.buffer.data).ravel())
        assert bytes(out) == payload

    def test_sink_writes_filelike(self):
        dst = io.BytesIO()
        p = parse_launch("appsrc name=in ! application/octet-stream "
                         "! giostreamsink name=k")
        p.get_by_name("k").props["stream"] = dst
        payload = b"gio-bytes" * 100
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(payload, np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        assert dst.getvalue() == payload

    def test_roundtrip(self):
        dst = io.BytesIO()
        src = io.BytesIO(b"\x42" * 1000)
        p = parse_launch("giostreamsrc name=s ! "
                         "application/octet-stream ! "
                         "giostreamsink name=k")
        p.get_by_name("s").props["stream"] = src
        p.get_by_name("k").props["stream"] = dst
        p.run()
        assert dst.getvalue() == b"\x42" * 1000


class TestDvDemux:
    def _frame(self, pal=False, fill=0x11):
        size = 144000 if pal else 120000
        f = bytearray([fill]) * size
        f[0:3] = b"\x1f\x07\x00"                 # header DIF id
        f[3] = 0x80 if pal else 0x00             # DSF
        return bytes(f)

    def test_ntsc_frames(self):
        f = self._frame(pal=False)
        p = parse_launch("appsrc name=in ! application/octet-stream "
                         "! dvdemux ! appsink name=o")
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(f + f, np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        sizes = []
        while (s := p.get_by_name("o").pull_sample()) is not None:
            d = s.buffer.data
            arr = np.asarray(d)
            if arr.ndim > 1:
                sizes.extend(r.size for r in arr)
            else:
                sizes.append(arr.size)
        assert sizes == [120000, 120000]

    def test_pal_frame_size(self):
        f = self._frame(pal=True)
        p = parse_launch("appsrc name=in ! application/octet-stream "
                         "! dvdemux ! appsink name=o")
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(f, np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        s = p.get_by_name("o").pull_sample()
        assert np.asarray(s.buffer.data).size == 144000
