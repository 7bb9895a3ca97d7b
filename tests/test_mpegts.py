"""MPEG-TS mux/demux: packet layer, PSI, PES roundtrips."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.audioparsers import mp3_frame_info
from gstreamer_tpu.elements.mpegts import PKT, mpeg_crc32
from tests.test_audioparsers import make_mp3_frame


class TestTsLayer:
    def test_crc32_vector(self):
        # CRC-32/MPEG-2 check value for "123456789"
        assert mpeg_crc32(b"123456789") == 0x0376E6E7

    def test_packet_alignment(self, tmp_path):
        path = tmp_path / "a.ts"
        frames = [make_mp3_frame()[0] for _ in range(10)]
        p = parse_launch(
            f"appsrc name=in ! application/octet-stream ! "
            f"mpegaudioparse ! mpegtsmux location={path}")
        src = p.get_by_name("in")
        src.push_buffer(Buffer(
            data=np.frombuffer(b"".join(frames), np.uint8)))
        src.end_of_stream()
        p.run()
        p.set_state("null")
        blob = open(path, "rb").read()
        assert len(blob) % PKT == 0
        for pos in range(0, len(blob), PKT):
            assert blob[pos] == 0x47

    def test_roundtrip_mp3_frames(self, tmp_path):
        path = tmp_path / "r.ts"
        frames = [make_mp3_frame(fill=k)[0] for k in range(8)]
        p = parse_launch(
            f"appsrc name=in ! application/octet-stream ! "
            f"mpegaudioparse ! mpegtsmux location={path}")
        src = p.get_by_name("in")
        src.push_buffer(Buffer(
            data=np.frombuffer(b"".join(frames), np.uint8)))
        src.end_of_stream()
        p.run()
        p.set_state("null")

        d = parse_launch(
            f"tsdemux location={path} ! mpegaudioparse ! "
            f"appsink name=out")
        d.run()
        got = []
        while (s := d.get_by_name("out").pull_sample()) is not None:
            blobs = s.buffer.data if isinstance(s.buffer.data, list) \
                else list(s.buffer.data)
            got.extend(
                bytes(b) if isinstance(b, (bytes, bytearray))
                else np.asarray(b).tobytes() for b in blobs)
        assert b"".join(got) == b"".join(frames)

    def test_pts_carried(self, tmp_path):
        path = tmp_path / "p.ts"
        frames = [make_mp3_frame()[0] for _ in range(6)]
        p = parse_launch(
            f"appsrc name=in ! application/octet-stream ! "
            f"mpegaudioparse ! mpegtsmux location={path}")
        src = p.get_by_name("in")
        src.push_buffer(Buffer(
            data=np.frombuffer(b"".join(frames), np.uint8), pts=0))
        src.end_of_stream()
        p.run()
        p.set_state("null")
        d = parse_launch(f"tsdemux location={path} ! appsink name=out")
        d.run()
        ptss = []
        while (s := d.get_by_name("out").pull_sample()) is not None:
            ptss.append(s.buffer.pts)
        # 1152 samples @44100 ~ 26.12ms per frame (90kHz rounding)
        assert ptss[0] == 0
        assert all(b > a for a, b in zip(ptss, ptss[1:])
                   if a is not None and b is not None)


class TestTsVideo:
    def test_h264_over_ts(self, tmp_path):
        from tests.test_videoparsers import SC, make_slice, make_sps
        path = tmp_path / "v.ts"
        aus = [SC + make_sps() + SC + make_slice(0, idr=(k == 0))
               for k in range(6)]
        p = parse_launch(
            f"appsrc name=in ! application/octet-stream ! h264parse "
            f"! mpegtsmux location={path}")
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(b"".join(aus), np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        p.set_state("null")

        d = parse_launch(
            f"tsdemux location={path} ! h264parse ! appsink name=out")
        d.run()
        got = []
        while (s := d.get_by_name("out").pull_sample()) is not None:
            blobs = s.buffer.data if isinstance(s.buffer.data, list) \
                else [np.asarray(s.buffer.data)[k]
                      for k in range(s.buffer.batch)]
            got.extend(
                bytes(b) if isinstance(b, (bytes, bytearray))
                else np.asarray(b).tobytes() for b in blobs)
        assert b"".join(got) == b"".join(aus)
