"""FLV container audio roundtrips (PCM + G.711)."""

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch


def _collect(p, name="out"):
    outs = []
    while (s := p.get_by_name(name).pull_sample()) is not None:
        outs.append(np.asarray(s.buffer.data))
    return np.concatenate(outs, axis=0)


class TestFlv:
    def test_pcm_s16_roundtrip(self, tmp_path):
        path = tmp_path / "a.flv"
        p = parse_launch(
            f"audiotestsrc num-buffers=5 samplesperbuffer=1024 "
            f"wave=saw ! audio/x-raw,format=S16LE,rate=22050,"
            f"channels=2 ! flvmux location={path}")
        p.run()
        p.set_state("null")
        blob = open(path, "rb").read()
        assert blob[:5] == b"FLV\x01\x04"

        d = parse_launch(f"flvdemux location={path} ! appsink name=out")
        d.run()
        got = _collect(d)
        g = parse_launch(
            "audiotestsrc num-buffers=5 samplesperbuffer=1024 "
            "wave=saw ! audio/x-raw,format=S16LE,rate=22050,"
            "channels=2 ! appsink name=out")
        g.run()
        np.testing.assert_array_equal(got, _collect(g))

    def test_mulaw_roundtrip(self, tmp_path):
        path = tmp_path / "u.flv"
        p = parse_launch(
            f"audiotestsrc num-buffers=3 samplesperbuffer=800 ! "
            f"audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            f"mulawenc ! flvmux location={path}")
        p.run()
        p.set_state("null")
        d = parse_launch(
            f"flvdemux location={path} ! mulawdec ! appsink name=out")
        d.run()
        got = _collect(d)
        assert got.dtype == np.int16 and got.shape == (2400, 1)

    def test_caps_recovered(self, tmp_path):
        path = tmp_path / "c.flv"
        p = parse_launch(
            f"audiotestsrc num-buffers=1 samplesperbuffer=500 ! "
            f"audio/x-raw,format=U8,rate=11025,channels=1 ! "
            f"flvmux location={path}")
        p.run()
        p.set_state("null")
        d = parse_launch(f"flvdemux location={path} ! appsink name=out")
        d.run()
        s = d.get_by_name("out").pull_sample()
        caps = s.caps[0]
        assert caps["rate"] == 11025 and caps["format"] == "U8"
