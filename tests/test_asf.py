"""asfmux/asfparse reduced (gst-plugins-bad/gst/asfmux/)."""

import struct

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.asf import (GUID_DATA, GUID_HEADER,
                                        GUID_STREAM_PROPS)


class TestAsf:
    def test_header_structure(self, tmp_path):
        path = tmp_path / "s.asf"
        p = parse_launch(
            f"audiotestsrc num-buffers=2 samplesperbuffer=400 ! "
            f"audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            f"asfmux location={path}")
        p.run()
        p.set_state("null")
        blob = path.read_bytes()
        assert blob[:16] == GUID_HEADER
        assert GUID_STREAM_PROPS in blob
        assert GUID_DATA in blob
        hdr_size = struct.unpack("<Q", blob[16:24])[0]
        assert blob[hdr_size:hdr_size + 16] == GUID_DATA

    def test_audio_bit_exact(self, tmp_path):
        path = tmp_path / "a.asf"
        p = parse_launch(
            f"audiotestsrc num-buffers=3 samplesperbuffer=500 "
            f"wave=saw ! audio/x-raw,format=S16LE,rate=16000,"
            f"channels=2 ! asfmux location={path}")
        p.run()
        p.set_state("null")
        d = parse_launch(f"asfparse location={path} stream=audio ! "
                         f"appsink name=out")
        d.run()
        got = np.concatenate(
            [np.asarray(s.buffer.data) for s in
             iter(lambda: d.get_by_name("out").pull_sample(), None)])
        gold = parse_launch(
            "audiotestsrc num-buffers=3 samplesperbuffer=500 "
            "wave=saw ! audio/x-raw,format=S16LE,rate=16000,"
            "channels=2 ! appsink name=out")
        gold.run()
        want = np.concatenate(
            [np.asarray(s.buffer.data) for s in
             iter(lambda: gold.get_by_name("out").pull_sample(),
                  None)])
        np.testing.assert_array_equal(got, want)

    def test_av_roundtrip(self, tmp_path):
        path = tmp_path / "av.asf"
        p = parse_launch(
            f"asfmux name=m location={path} "
            f"videotestsrc num-buffers=5 ! video/x-raw,format=I420,"
            f"width=48,height=32,framerate=10/1 ! jpegenc ! "
            f"m.video_0 "
            f"audiotestsrc num-buffers=5 samplesperbuffer=800 ! "
            f"audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            f"m.audio_0")
        p.run()
        p.set_state("null")
        dv = parse_launch(f"asfparse location={path} stream=video ! "
                          f"jpegdec ! appsink name=out")
        dv.run()
        frames = sum((s.buffer.batch or 1) for s in
                     iter(lambda: dv.get_by_name("out").pull_sample(),
                          None))
        assert frames == 5
        da = parse_launch(f"asfparse location={path} stream=audio ! "
                          f"appsink name=out")
        da.run()
        tot = sum(np.asarray(s.buffer.data).shape[0] for s in
                  iter(lambda: da.get_by_name("out").pull_sample(),
                       None))
        assert tot == 4000

    def test_caps_recovered(self, tmp_path):
        path = tmp_path / "c.asf"
        p = parse_launch(
            f"videotestsrc num-buffers=1 ! video/x-raw,format=I420,"
            f"width=96,height=64,framerate=5/1 ! jpegenc ! "
            f"asfmux location={path}")
        p.run()
        p.set_state("null")
        d = parse_launch(f"asfparse location={path} ! appsink "
                         f"name=out")
        d.run()
        s = d.get_by_name("out").pull_sample()
        assert s.caps[0].name == "image/jpeg"
        assert s.caps[0]["width"] == 96

    def test_rejects_garbage(self, tmp_path):
        path = tmp_path / "bad.asf"
        path.write_bytes(b"\x00" * 128)
        d = parse_launch(f"asfparse location={path} stream=audio ! "
                         f"fakesink")
        with pytest.raises(Exception):
            d.run()


class TestAsfInterop:
    """Two-way oracle interop with libavformat: our mux output demuxes
    with avformat (probe), and avformat-written WMA/WMV ASF files
    demux here and decode through avdec_wmav2/avdec_wmv2."""

    @pytest.fixture(scope="class")
    def real_asf(self, tmp_path_factory):
        from gstreamer_tpu.native import av
        if not av.available():
            pytest.skip("libavformat unavailable")
        path = str(tmp_path_factory.mktemp("asf") / "real.asf")
        if not av.write_asf(path, 160, 120, 25, True):
            pytest.skip("cannot write reference ASF")
        return path

    def test_our_mux_readable_by_avformat(self, tmp_path):
        from gstreamer_tpu.native import av
        if not av.available():
            pytest.skip("libavformat unavailable")
        path = tmp_path / "mine.asf"
        p = parse_launch(
            f"audiotestsrc num-buffers=4 samplesperbuffer=800 ! "
            f"audio/x-raw,format=S16LE,rate=22050,channels=1 ! "
            f"asfmux location={path}")
        p.run()
        p.set_state("null")
        info = av.probe(str(path))
        assert info and info[0]["codec"] == "pcm_s16le"
        assert info[0]["packets"] == 4
        assert info[0]["bytes"] == 4 * 800 * 2

    def test_parse_matches_avformat_packetization(self, real_asf):
        from gstreamer_tpu.elements.asf import _parse_asf
        from gstreamer_tpu.native import av
        streams, objects = _parse_asf(real_asf)
        ref = {s["codec"]: s for s in av.probe(real_asf)}
        per = {}
        for snum, _pts, _k, data in objects:
            kind = streams[snum]["kind"]
            n, b = per.get(kind, (0, 0))
            per[kind] = (n + 1, b + len(data))
        assert per["audio"] == (ref["wmav2"]["packets"],
                                ref["wmav2"]["bytes"])
        assert per["video"] == (ref["wmv2"]["packets"],
                                ref["wmv2"]["bytes"])

    def test_wma_decode_pipeline(self, real_asf):
        p = parse_launch(
            f"asfdemux location={real_asf} stream=audio ! "
            f"avdec_wmav2 ! appsink name=out")
        p.run()
        outs = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            outs.append(np.asarray(s.buffer.data))
        got = np.concatenate(outs)
        assert got.shape[0] > 30000 and got.shape[1] == 2
        # the encoded signal is a 440/660 Hz stereo sine pair
        seg = got[8192:24576, 0].astype(np.float64)
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        peak_hz = np.argmax(spec) * 44100 / len(seg)
        assert abs(peak_hz - 440) < 15
        seg1 = got[8192:24576, 1].astype(np.float64)
        spec1 = np.abs(np.fft.rfft(seg1 * np.hanning(len(seg1))))
        assert abs(np.argmax(spec1) * 44100 / len(seg1) - 660) < 15

    def test_wmv_decode_pipeline(self, real_asf):
        p = parse_launch(
            f"asfdemux location={real_asf} stream=video ! "
            f"avdec_wmv2 ! appsink name=out")
        p.run()
        n = 0
        while (s := p.get_by_name("out").pull_sample()) is not None:
            y = np.asarray(s.buffer.data[0])
            assert y.shape[-2:] == (120, 160)
            n += y.shape[0]
        assert n == 25
