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


class TestFlvCodedStreams:
    """H.264 video and AAC audio in FLV (gstflvdemux.c codec 7 /
    sound format 10; clean-room AAC decode on the read side)."""

    def _needs_av(self):
        from gstreamer_tpu.native import av as native_av
        if not native_av.available():
            pytest.skip("libavcodec shim unavailable")

    def test_h264_video(self, tmp_path):
        self._needs_av()
        path = tmp_path / "v.flv"
        p = parse_launch(
            "videotestsrc num-buffers=5 pattern=gradient ! "
            "video/x-raw,format=I420,width=64,height=48,"
            f"framerate=30/1 ! x264enc ! flvmux location={path}")
        p.run()
        data = path.read_bytes()
        assert b"onMetaData" in data
        d = parse_launch(f"flvdemux location={path} stream=video ! "
                         "avdec_h264 ! appsink name=out")
        dem = [e for e in d.iterate_elements()
               if e.FACTORY == "flvdemux"][0]
        caps = dem.get_caps()
        assert caps[0]["width"] == 64 and caps[0]["height"] == 48
        d.run()
        sink = d.get_by_name("out")
        total = 0
        while (s := sink.pull_sample()) is not None:
            total += np.asarray(s.buffer.data[0]).shape[0]
        assert total == 5

    def test_aac_audio(self, tmp_path):
        self._needs_av()
        path = tmp_path / "a.flv"
        p = parse_launch(
            "audiotestsrc num-buffers=5 samplesperbuffer=4096 ! "
            f"avenc_aac ! flvmux location={path}")
        p.run()
        d = parse_launch(f"flvdemux location={path} ! "
                         "appsink name=out")
        d.run()
        sink = d.get_by_name("out")
        chunks = []
        while (s := sink.pull_sample()) is not None:
            chunks.append(np.asarray(s.buffer.data))
        pcm = np.concatenate(chunks)
        assert pcm.shape[0] > 15000 and pcm.dtype == np.float32
        spec = np.abs(np.fft.rfft(pcm[2048:2048 + 8192, 0]))
        assert spec.max() > 20 * np.median(spec + 1e-12)
