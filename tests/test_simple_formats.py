"""pnm, au, aiff format roundtrips."""

import struct

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.simple_formats import (_float80_decode,
                                                   _float80_encode,
                                                   pnm_decode,
                                                   pnm_encode)


class TestPnm:
    def test_p6_roundtrip(self):
        rng = np.random.default_rng(0)
        rgb = rng.integers(0, 256, (20, 30, 3)).astype(np.uint8)
        blob = pnm_encode([rgb[..., 0], rgb[..., 1], rgb[..., 2]],
                          "RGB")
        assert blob.startswith(b"P6\n30 20\n255\n")
        arr, fmt = pnm_decode(blob)
        assert fmt == "RGB"
        np.testing.assert_array_equal(arr, rgb)

    def test_ascii_p2(self):
        blob = b"P2\n# comment\n3 2\n255\n0 128 255\n10 20 30\n"
        arr, fmt = pnm_decode(blob)
        assert fmt == "GRAY8"
        np.testing.assert_array_equal(
            arr, [[0, 128, 255], [10, 20, 30]])

    def test_p4_bitmap(self):
        # 8x1: bits 10110001 -> black where 1
        blob = b"P4\n8 1\n" + bytes([0b10110001])
        arr, fmt = pnm_decode(blob)
        np.testing.assert_array_equal(
            arr[0], [0, 255, 0, 0, 255, 255, 255, 0])

    def test_pipeline_roundtrip(self, tmp_path):
        p = parse_launch(
            "videotestsrc num-buffers=2 pattern=gradient ! "
            "video/x-raw,format=RGB,width=48,height=32 ! "
            "tee name=t t. ! queue ! appsink name=raw "
            "t. ! queue ! pnmenc ! pnmdec ! appsink name=rt")
        p.run()
        raw = [np.asarray(x) for x in
               p.get_by_name("raw").pull_sample().buffer.data]
        rt = [np.asarray(x) for x in
              p.get_by_name("rt").pull_sample().buffer.data]
        for a, b in zip(raw, rt):
            np.testing.assert_array_equal(a, b)


class TestAu:
    def test_s16be_roundtrip(self, tmp_path):
        path = tmp_path / "a.au"
        p = parse_launch(
            f"audiotestsrc num-buffers=3 samplesperbuffer=500 "
            f"wave=saw ! audio/x-raw,format=S16BE,rate=8000,"
            f"channels=2 ! auenc location={path}")
        p.run()
        p.set_state("null")
        blob = open(path, "rb").read()
        assert blob[:4] == b".snd"
        enc = struct.unpack(">I", blob[12:16])[0]
        assert enc == 3

        d = parse_launch(f"auparse location={path} ! appsink name=out")
        d.run()
        got = np.asarray(d.get_by_name("out").pull_sample().buffer.data)
        assert got.shape == (1500, 2)

        g = parse_launch(
            "audiotestsrc num-buffers=3 samplesperbuffer=500 wave=saw "
            "! audio/x-raw,format=S16BE,rate=8000,channels=2 ! "
            "appsink name=out")
        g.run()
        want = np.asarray(g.get_by_name("out").pull_sample().buffer.data)
        np.testing.assert_array_equal(got[:500], want)

    def test_mulaw_au(self, tmp_path):
        path = tmp_path / "u.au"
        p = parse_launch(
            f"audiotestsrc num-buffers=2 samplesperbuffer=400 ! "
            f"audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            f"mulawenc ! auenc location={path}")
        p.run()
        p.set_state("null")
        blob = open(path, "rb").read()
        assert struct.unpack(">I", blob[12:16])[0] == 1   # mu-law
        d = parse_launch(
            f"auparse location={path} ! mulawdec ! appsink name=out")
        d.run()
        got = np.asarray(d.get_by_name("out").pull_sample().buffer.data)
        assert got.shape == (800, 1) and got.dtype == np.int16


class TestAiff:
    def test_float80(self):
        for v in (44100.0, 8000.0, 96000.0, 22050.0):
            assert _float80_decode(_float80_encode(v)) == v

    @pytest.mark.parametrize("fmt", ["S16BE", "S8"])
    def test_roundtrip(self, fmt, tmp_path):
        path = tmp_path / "a.aiff"
        p = parse_launch(
            f"audiotestsrc num-buffers=4 samplesperbuffer=250 "
            f"wave=sine ! audio/x-raw,format={fmt},rate=22050,"
            f"channels=2 ! aiffmux location={path}")
        p.run()
        p.set_state("null")
        blob = open(path, "rb").read()
        assert blob[:4] == b"FORM" and blob[8:12] == b"AIFF"

        d = parse_launch(
            f"aiffparse location={path} ! appsink name=out")
        d.run()
        outs = []
        while (s := d.get_by_name("out").pull_sample()) is not None:
            outs.append(np.asarray(s.buffer.data))
        got = np.concatenate(outs)
        assert got.shape == (1000, 2)

        g = parse_launch(
            f"audiotestsrc num-buffers=4 samplesperbuffer=250 "
            f"wave=sine ! audio/x-raw,format={fmt},rate=22050,"
            f"channels=2 ! appsink name=out")
        g.run()
        wants = []
        while (s := g.get_by_name("out").pull_sample()) is not None:
            wants.append(np.asarray(s.buffer.data))
        np.testing.assert_array_equal(got, np.concatenate(wants))
