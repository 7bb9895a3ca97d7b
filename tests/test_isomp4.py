"""qtmux/qtdemux: bit-exact A/V roundtrips through QuickTime files,
MJPEG track support, and box-structure sanity."""

import struct

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch


def _pull_frames(p, name="out"):
    sink = p.get_by_name(name)
    frames = []
    while (s := sink.pull_sample()) is not None:
        d = s.buffer.data
        d = [np.asarray(x) for x in (d if isinstance(d, (list, tuple))
                                     else [d])]
        frames.append(d)
    return frames


class TestVideoRoundtrip:
    @pytest.mark.parametrize("fmt", ["UYVY", "v308", "RGB"])
    def test_video_bit_exact(self, fmt, tmp_path):
        path = tmp_path / "t.mov"
        p = parse_launch(
            f"videotestsrc num-buffers=5 ! "
            f"video/x-raw,format={fmt},width=64,height=48,"
            f"framerate=25/1 ! qtmux location={path}")
        p.run()
        p.set_state("null")

        src = parse_launch(
            f"qtdemux location={path} stream=video ! appsink name=out")
        src.run()
        frames = _pull_frames(src)
        total = sum(f[0].shape[0] for f in frames)
        assert total == 5

        gold = parse_launch(
            f"videotestsrc num-buffers=5 ! "
            f"video/x-raw,format={fmt},width=64,height=48,"
            f"framerate=25/1 ! appsink name=out")
        gold.run()
        gf = _pull_frames(gold)
        got = [np.concatenate([f[c] for f in frames])
               for c in range(len(frames[0]))]
        want = [np.concatenate([f[c] for f in gf])
                for c in range(len(gf[0]))]
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)

    def test_caps_recovered(self, tmp_path):
        path = tmp_path / "t.mov"
        p = parse_launch(
            f"videotestsrc num-buffers=2 ! "
            f"video/x-raw,format=UYVY,width=128,height=72,"
            f"framerate=30/1 ! qtmux location={path}")
        p.run()
        p.set_state("null")
        d = parse_launch(
            f"qtdemux location={path} ! appsink name=out")
        d.run()
        caps = [e for e in d.elements
                if e.FACTORY == "qtdemux"][0].get_caps()[0]
        assert caps["width"] == 128 and caps["height"] == 72
        assert caps["format"] == "UYVY"
        fr = caps["framerate"]
        assert (fr.num, fr.denom) == (30, 1)


class TestAudioRoundtrip:
    @pytest.mark.parametrize("fmt", ["S16LE", "S16BE", "U8"])
    def test_pcm_bit_exact(self, fmt, tmp_path):
        path = tmp_path / "a.mov"
        p = parse_launch(
            f"audiotestsrc num-buffers=4 samplesperbuffer=500 "
            f"wave=saw ! audio/x-raw,format={fmt},rate=8000,channels=2 "
            f"! qtmux location={path}")
        p.run()
        p.set_state("null")

        d = parse_launch(
            f"qtdemux location={path} stream=audio ! appsink name=out")
        d.run()
        frames = _pull_frames(d)
        got = np.concatenate([f[0] for f in frames])
        assert got.shape == (2000, 2)

        gold = parse_launch(
            f"audiotestsrc num-buffers=4 samplesperbuffer=500 "
            f"wave=saw ! audio/x-raw,format={fmt},rate=8000,channels=2 "
            f"! appsink name=out")
        gold.run()
        want = np.concatenate([f[0] for f in _pull_frames(gold)])
        np.testing.assert_array_equal(got, want)

    def test_mulaw_track(self, tmp_path):
        path = tmp_path / "u.mov"
        p = parse_launch(
            f"audiotestsrc num-buffers=2 samplesperbuffer=400 ! "
            f"audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            f"mulawenc ! qtmux location={path}")
        p.run()
        p.set_state("null")
        # fourcc in stsd is 'ulaw'
        blob = open(path, "rb").read()
        assert b"ulaw" in blob
        d = parse_launch(
            f"qtdemux location={path} stream=audio ! mulawdec "
            f"! appsink name=out")
        d.run()
        got = np.concatenate([f[0] for f in _pull_frames(d)])
        assert got.shape[0] == 800 and got.dtype == np.int16


class TestAvMux:
    def test_av_file_both_streams(self, tmp_path):
        path = tmp_path / "av.mov"
        p = parse_launch(
            f"qtmux name=m location={path} "
            f"videotestsrc num-buffers=10 ! "
            f"video/x-raw,format=UYVY,width=32,height=24,"
            f"framerate=10/1 ! m.video_0 "
            f"audiotestsrc num-buffers=10 samplesperbuffer=800 ! "
            f"audio/x-raw,format=S16LE,rate=8000,channels=2 ! m.audio_0")
        p.run()
        p.set_state("null")
        for sel, n in (("video", 10), ("audio", 8000)):
            d = parse_launch(
                f"qtdemux location={path} stream={sel} "
                f"! appsink name=out")
            d.run()
            frames = _pull_frames(d)
            total = sum(f[0].shape[0] for f in frames)
            assert total == n, (sel, total)

    def test_ftyp_and_moov_present(self, tmp_path):
        path = tmp_path / "s.mov"
        p = parse_launch(
            f"videotestsrc num-buffers=1 ! "
            f"video/x-raw,format=RGB,width=16,height=16 ! "
            f"qtmux location={path}")
        p.run()
        p.set_state("null")
        blob = open(path, "rb").read()
        assert blob[4:8] == b"ftyp" and blob[8:12] == b"qt  "
        assert b"moov" in blob and b"mdat" in blob
        assert b"stsd" in blob and b"stco" in blob


class TestMjpeg:
    def test_mjpeg_roundtrip(self, tmp_path):
        path = tmp_path / "mj.mov"
        p = parse_launch(
            f"videotestsrc num-buffers=3 ! "
            f"video/x-raw,format=I420,width=64,height=48,"
            f"framerate=15/1 ! jpegenc ! qtmux location={path}")
        p.run()
        p.set_state("null")
        blob = open(path, "rb").read()
        assert b"jpeg" in blob

        d = parse_launch(
            f"qtdemux location={path} stream=video ! jpegdec "
            f"! appsink name=out")
        d.run()
        frames = _pull_frames(d)
        total = sum(f[0].shape[0] for f in frames)
        assert total == 3
        assert frames[0][0].shape[-2:] == (48, 64)


class TestH264Track:
    def test_avc1_roundtrip(self, tmp_path):
        from tests.test_videoparsers import SC, make_slice, make_sps
        path = tmp_path / "h.mov"
        sps = make_sps(8, 6)
        slices = [make_slice(0, idr=(k == 0)) for k in range(6)]
        aus = [SC + sps + SC + s for s in slices]
        p = parse_launch(
            f"appsrc name=in ! application/octet-stream ! h264parse "
            f"! qtmux location={path}")
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(b"".join(aus), np.uint8), pts=0,
            duration=200_000_000))
        p.get_by_name("in").end_of_stream()
        p.run()
        p.set_state("null")
        blob = open(path, "rb").read()
        assert b"avc1" in blob and b"avcC" in blob

        d = parse_launch(
            f"qtdemux location={path} stream=video ! appsink name=out")
        d.run()
        nals = []
        while (s := d.get_by_name("out").pull_sample()) is not None:
            assert s.caps[0].name == "video/x-h264"
            blobs = s.buffer.data if isinstance(s.buffer.data, list) \
                else [s.buffer.data]
            for b in blobs:
                raw = (bytes(b) if isinstance(b, (bytes, bytearray))
                       else np.asarray(b).tobytes())
                pos = 0
                while True:
                    i = raw.find(b"\x00\x00\x01", pos)
                    if i < 0:
                        break
                    j = raw.find(b"\x00\x00\x01", i + 3)
                    end = (j - (1 if raw[j - 1] == 0 else 0)
                           if j >= 0 else len(raw))
                    nals.append(raw[i + 3:end])
                    pos = i + 3
        # every slice NAL survives; SPS/PPS carried via avcC
        assert sps in nals
        for sl in slices:
            assert sl in nals
