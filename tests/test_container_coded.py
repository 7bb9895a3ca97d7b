"""H.264 / MJPEG tracks in avimux/avidemux and matroskamux/
matroskademux (gstavimux.c:566 fourcc table, matroska-mux.c
V_MPEG4/ISO/AVC + avcC CodecPrivate)."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch


def _h264_stream():
    from tests.test_videoparsers import SC, make_slice, make_sps
    sps = make_sps(8, 6)
    slices = [make_slice(0, idr=(k == 0)) for k in range(5)]
    return sps, slices, b"".join(SC + sps + SC + s for s in slices)


def _push_h264(muxline, path):
    _, slices, stream = _h264_stream()
    p = parse_launch(
        f"appsrc name=in ! application/octet-stream ! h264parse ! "
        f"{muxline} location={path}")
    p.get_by_name("in").push_buffer(Buffer(
        data=np.frombuffer(stream, np.uint8), pts=0))
    p.get_by_name("in").end_of_stream()
    p.run()
    p.set_state("null")
    return slices


def _nals(raw: bytes):
    out = []
    pos = 0
    while True:
        i = raw.find(b"\x00\x00\x01", pos)
        if i < 0:
            return out
        j = raw.find(b"\x00\x00\x01", i + 3)
        end = (j - (1 if raw[j - 1] == 0 else 0)) if j >= 0 else len(raw)
        out.append(raw[i + 3:end])
        pos = i + 3


def _demux_blobs(launch):
    d = parse_launch(launch)
    d.run()
    sink = d.get_by_name("out")
    blobs, caps = [], None
    while (s := sink.pull_sample()) is not None:
        caps = s.caps
        dd = s.buffer.data
        for b in (dd if isinstance(dd, (list, tuple)) else [dd]):
            blobs.append(np.asarray(b).tobytes())
    return blobs, caps


class TestAviH264:
    def test_roundtrip(self, tmp_path):
        path = tmp_path / "h.avi"
        slices = _push_h264("avimux", path)
        blob = open(path, "rb").read()
        assert b"H264" in blob and b"00dc" in blob

        blobs, caps = _demux_blobs(
            f"avidemux location={path} stream=video ! appsink name=out")
        assert caps[0].name == "video/x-h264"
        assert caps[0]["stream-format"] == "byte-stream"
        nals = [n for b in blobs for n in _nals(b)]
        for sl in slices:
            assert sl in nals

    def test_mjpeg_roundtrip(self, tmp_path):
        path = tmp_path / "mj.avi"
        p = parse_launch(
            f"videotestsrc num-buffers=3 ! video/x-raw,format=I420,"
            f"width=48,height=32,framerate=10/1 ! jpegenc ! "
            f"avimux location={path}")
        p.run()
        p.set_state("null")
        assert b"MJPG" in open(path, "rb").read()
        blobs, caps = _demux_blobs(
            f"avidemux location={path} stream=video ! appsink name=out")
        assert caps[0].name == "image/jpeg"
        assert len(blobs) == 3
        assert all(b.startswith(b"\xff\xd8") for b in blobs)
        # decodable chain
        d = parse_launch(
            f"avidemux location={path} stream=video ! jpegdec ! "
            f"appsink name=out")
        d.run()
        s = d.get_by_name("out").pull_sample()
        assert s is not None


class TestMatroskaH264:
    def test_roundtrip(self, tmp_path):
        path = tmp_path / "h.mkv"
        slices = _push_h264("matroskamux", path)
        blob = open(path, "rb").read()
        assert b"V_MPEG4/ISO/AVC" in blob

        blobs, caps = _demux_blobs(
            f"matroskademux location={path} stream=video ! "
            f"appsink name=out")
        assert caps[0].name == "video/x-h264"
        nals = [n for b in blobs for n in _nals(b)]
        sps, _, _ = _h264_stream()
        assert sps in nals                      # from CodecPrivate
        for sl in slices:
            assert sl in nals

    def test_mjpeg_track(self, tmp_path):
        path = tmp_path / "mj.mkv"
        p = parse_launch(
            f"videotestsrc num-buffers=2 ! video/x-raw,format=I420,"
            f"width=48,height=32,framerate=10/1 ! jpegenc ! "
            f"matroskamux location={path}")
        p.run()
        p.set_state("null")
        assert b"V_MJPEG" in open(path, "rb").read()
        blobs, caps = _demux_blobs(
            f"matroskademux location={path} stream=video ! "
            f"jpegdec ! appsink name=out")
        assert blobs

    def test_raw_still_works(self, tmp_path):
        path = tmp_path / "raw.mkv"
        p = parse_launch(
            f"videotestsrc num-buffers=2 ! video/x-raw,format=I420,"
            f"width=32,height=24,framerate=10/1 ! "
            f"matroskamux location={path}")
        p.run()
        p.set_state("null")
        d = parse_launch(f"matroskademux location={path} ! "
                         f"appsink name=out")
        d.run()
        s = d.get_by_name("out").pull_sample()
        assert s.caps[0]["format"] == "I420"
