"""mxfmux/mxfdemux reduced OP1a (gst-plugins-bad/gst/mxf/)."""

import struct

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.mxf import (ESSENCE_PREFIX, UL_OP1A,
                                        UL_PRIMER, ber, read_ber)


def _pull(p, name="out"):
    out = []
    while (s := p.get_by_name(name).pull_sample()) is not None:
        out.append(s)
    return out


class TestKlv:
    def test_ber_roundtrip(self):
        for n in (0, 1, 127, 128, 100000):
            b = ber(n)
            got, pos = read_ber(b, 0)
            assert got == n and pos == len(b)

    def test_short_form_read(self):
        assert read_ber(b"\x05", 0) == (5, 1)


class TestVideoRoundtrip:
    def test_bit_exact(self, tmp_path):
        path = tmp_path / "v.mxf"
        p = parse_launch(
            f"videotestsrc num-buffers=5 ! video/x-raw,format=UYVY,"
            f"width=64,height=48,framerate=25/1 ! mxfmux "
            f"location={path}")
        p.run()
        p.set_state("null")
        blob = path.read_bytes()
        # SMPTE partition pack key leads the file
        assert blob[:13] == bytes((0x06, 0x0E, 0x2B, 0x34, 0x02,
                                   0x05, 0x01, 0x01, 0x0D, 0x01,
                                   0x02, 0x01, 0x01))
        assert UL_OP1A in blob

        d = parse_launch(f"mxfdemux location={path} stream=video ! "
                         f"appsink name=out")
        d.run()
        frames = _pull(d)
        assert sum(s.buffer.batch or 1 for s in frames) == 5
        st = frames[0].caps[0]
        assert st["width"] == 64 and st["height"] == 48
        assert st["format"] == "UYVY"
        fr = st["framerate"]
        assert (fr.num, fr.denom) == (25, 1)

        gold = parse_launch(
            "videotestsrc num-buffers=5 ! video/x-raw,format=UYVY,"
            "width=64,height=48,framerate=25/1 ! appsink name=out")
        gold.run()
        gf = _pull(gold)
        for c in range(len(frames[0].buffer.data)):
            a = np.concatenate([np.asarray(s.buffer.data[c])
                                for s in frames])
            b = np.concatenate([np.asarray(s.buffer.data[c])
                                for s in gf])
            np.testing.assert_array_equal(a, b)


class TestAudioRoundtrip:
    def test_pcm_bit_exact(self, tmp_path):
        path = tmp_path / "a.mxf"
        p = parse_launch(
            f"audiotestsrc num-buffers=4 samplesperbuffer=500 "
            f"wave=saw ! audio/x-raw,format=S16LE,rate=48000,"
            f"channels=2 ! mxfmux location={path}")
        p.run()
        p.set_state("null")
        d = parse_launch(f"mxfdemux location={path} stream=audio ! "
                         f"appsink name=out")
        d.run()
        got = np.concatenate([np.asarray(s.buffer.data)
                              for s in _pull(d)])
        assert got.shape == (2000, 2)
        gold = parse_launch(
            "audiotestsrc num-buffers=4 samplesperbuffer=500 "
            "wave=saw ! audio/x-raw,format=S16LE,rate=48000,"
            "channels=2 ! appsink name=out")
        gold.run()
        want = np.concatenate([np.asarray(s.buffer.data)
                               for s in _pull(gold)])
        np.testing.assert_array_equal(got, want)


class TestAvMux:
    def test_both_streams(self, tmp_path):
        path = tmp_path / "av.mxf"
        p = parse_launch(
            f"mxfmux name=m location={path} "
            f"videotestsrc num-buffers=10 ! video/x-raw,format=UYVY,"
            f"width=32,height=24,framerate=10/1 ! m.video_0 "
            f"audiotestsrc num-buffers=10 samplesperbuffer=4800 ! "
            f"audio/x-raw,format=S16LE,rate=48000,channels=2 ! "
            f"m.audio_0")
        p.run()
        p.set_state("null")
        dv = parse_launch(f"mxfdemux location={path} stream=video ! "
                          f"appsink name=out")
        dv.run()
        assert sum(s.buffer.batch or 1 for s in _pull(dv)) == 10
        da = parse_launch(f"mxfdemux location={path} stream=audio ! "
                          f"appsink name=out")
        da.run()
        assert sum(np.asarray(s.buffer.data).shape[0]
                   for s in _pull(da)) == 48000

    def test_essence_klv_structure(self, tmp_path):
        path = tmp_path / "s.mxf"
        p = parse_launch(
            f"videotestsrc num-buffers=2 ! video/x-raw,format=UYVY,"
            f"width=16,height=16,framerate=10/1 ! mxfmux "
            f"location={path}")
        p.run()
        p.set_state("null")
        blob = path.read_bytes()
        assert UL_PRIMER[:13] in blob
        # two picture essence KLVs of 16*16*2 bytes each
        count = 0
        pos = 0
        while True:
            i = blob.find(ESSENCE_PREFIX, pos)
            if i < 0:
                break
            length, vpos = read_ber(blob, i + 16)
            assert length == 16 * 16 * 2
            count += 1
            pos = vpos + length
        assert count == 2


class TestCodedEssence:
    """381M MPEG / 381-3 AVC picture essence (mxfmpeg.c analog)."""

    @pytest.mark.parametrize("caps,codec", [
        ("video/x-h264,stream-format=byte-stream,alignment=au,"
         "width=64,height=48,framerate=25/1", "video/x-h264"),
        ("video/mpeg,mpegversion=2,systemstream=false,"
         "width=64,height=48,framerate=25/1", "video/mpeg"),
    ])
    def test_coded_roundtrip(self, tmp_path, caps, codec):
        from gstreamer_tpu.core.buffer import Buffer
        from gstreamer_tpu.core.element import element_factory_make
        path = tmp_path / "c.mxf"
        rng = np.random.default_rng(9)
        aus = [bytes(rng.integers(0, 256, 120 + 13 * k, np.uint8))
               for k in range(4)]
        p = parse_launch(f"appsrc name=in caps=\"{caps}\" ! "
                         f"mxfmux location={path}")
        src = p.get_by_name("in")
        for k, au in enumerate(aus):
            src.push_buffer(Buffer(
                data=np.frombuffer(au, np.uint8),
                pts=k * 40_000_000, batch=1))
        src.end_of_stream()
        p.run()
        p.set_state("null")

        d = parse_launch(f"mxfdemux location={path} stream=video ! "
                         f"appsink name=out")
        d.run()
        frames = _pull(d)
        got = [np.asarray(s.buffer.data).tobytes() for s in frames]
        assert got == aus                      # byte-exact essence
        st = frames[0].caps[0]
        assert st.name == codec
        assert st["width"] == 64 and st["height"] == 48
        # MPEG video descriptor present, not CDCI
        from gstreamer_tpu.elements.mxf import (SET_MPEG_DESCRIPTOR,
                                                _meta_ul)
        assert _meta_ul(SET_MPEG_DESCRIPTOR) in path.read_bytes()


class TestMultiStream:
    def test_one_parse_av_pads(self, tmp_path):
        """video_0/audio_0 sometimes-pads from a single parse."""
        path = tmp_path / "av.mxf"
        p = parse_launch(
            f"mxfmux name=m location={path} ! fakesink "
            "videotestsrc num-buffers=4 ! video/x-raw,format=UYVY,"
            "width=32,height=24,framerate=25/1 ! m.video_0 "
            "audiotestsrc num-buffers=4 samplesperbuffer=1000 ! "
            "audio/x-raw,format=S16LE,rate=48000,channels=2 ! "
            "m.audio_0")
        p.run()
        p.set_state("null")

        d = parse_launch(f"mxfdemux name=d location={path} "
                         "d.video_0 ! appsink name=v "
                         "d.audio_0 ! appsink name=a")
        d.run()
        vn = sum(s.buffer.batch or 1 for s in _pull(d, "v"))
        an = sum(np.asarray(s.buffer.data).shape[0]
                 for s in _pull(d, "a"))
        assert vn == 4
        assert an == 4000
        assert d.get_by_name("d").operational_pattern == "op1a"


class TestOperationalPattern:
    def test_op_name_mapping(self):
        from gstreamer_tpu.elements.mxf import UL_OP1A, op_name
        assert op_name(UL_OP1A) == "op1a"
        atom = bytearray(UL_OP1A)
        atom[12], atom[13] = 0x10, 0x00
        assert op_name(bytes(atom)) == "opatom"
        assert op_name(b"") == "unknown"


class TestMxfInterop:
    """Two-way oracle interop with libavformat: our OP1a output probes
    under avformat, and an avformat-written MXF (mpeg2video + PCM,
    KAG-aligned partitions + index segments) demuxes here and decodes
    end-to-end."""

    @pytest.fixture(scope="class")
    def real_mxf(self, tmp_path_factory):
        from gstreamer_tpu.native import av
        if not av.available():
            pytest.skip("libavformat unavailable")
        path = str(tmp_path_factory.mktemp("mxf") / "real.mxf")
        if not av.write_mxf(path, 160, 120, 25):
            pytest.skip("cannot write reference MXF")
        return path

    def test_our_mux_readable_by_avformat(self, tmp_path):
        from gstreamer_tpu.native import av
        if not av.available():
            pytest.skip("libavformat unavailable")
        path = tmp_path / "mine.mxf"
        p = parse_launch(
            f"audiotestsrc num-buffers=4 samplesperbuffer=800 ! "
            f"audio/x-raw,format=S16LE,rate=48000,channels=2 ! "
            f"mxfmux location={path}")
        p.run()
        p.set_state("null")
        info = av.probe(str(path))
        assert info and info[0]["codec"] == "pcm_s16le"
        assert info[0]["bytes"] == 4 * 800 * 2 * 2

    def test_mpeg2_video_decodes(self, real_mxf):
        p = parse_launch(
            f"mxfdemux location={real_mxf} stream=video ! "
            f"avdec_mpeg2video ! appsink name=o")
        p.run()
        n = 0
        while (s := p.get_by_name("o").pull_sample()) is not None:
            y = np.asarray(s.buffer.data[0])
            assert y.shape[-2:] == (120, 160)
            n += y.shape[0]
        assert n == 25

    def test_pcm_audio_tone(self, real_mxf):
        p = parse_launch(
            f"mxfdemux location={real_mxf} stream=audio ! "
            f"appsink name=o")
        p.run()
        outs = []
        while (s := p.get_by_name("o").pull_sample()) is not None:
            outs.append(np.asarray(s.buffer.data))
        a = np.concatenate(outs)
        assert a.shape == (48000, 1) and a.dtype == np.int16
        seg = a[8192:24576, 0].astype(np.float64)
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        assert abs(np.argmax(spec) * 48000 / len(seg) - 440) < 10
