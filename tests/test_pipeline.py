"""Pipeline/parse_launch tests (modeled on the reference's
tests/check/pipelines/ and gstutils link tests)."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.element import element_factory_make, list_factories
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.core.pipeline import Pipeline, link


class TestRegistry:
    def test_factories_exist(self):
        facs = list_factories()
        for f in ("videotestsrc", "videoconvert", "videoscale", "capsfilter",
                  "identity", "fakesink", "appsink", "appsrc", "queue", "tee"):
            assert f in facs

    def test_make_with_props(self):
        e = element_factory_make("videotestsrc", pattern="snow",
                                 **{"num-buffers": 5})
        assert e.get_property("pattern") == "snow"
        assert e.get_property("num-buffers") == 5

    def test_bad_property(self):
        with pytest.raises(ValueError):
            element_factory_make("identity", nosuch=1)


class TestNegotiation:
    def test_simple_chain(self):
        p = Pipeline()
        src = element_factory_make("videotestsrc", **{"num-buffers": 2})
        conv = element_factory_make("videoconvert")
        sink = element_factory_make("fakesink")
        p.add(src, conv, sink)
        link(src, conv)
        link(conv, sink)
        p.negotiate()
        assert src.src_pads()[0].caps.is_fixed()
        s = src.src_pads()[0].caps[0]
        assert s["width"] == 320 and s["height"] == 240

    def test_capsfilter_forces_format(self):
        p = parse_launch(
            "videotestsrc num-buffers=1 ! videoconvert ! "
            "video/x-raw,format=RGB,width=320,height=240 ! fakesink")
        p.negotiate()
        conv = [e for e in p.iterate_elements()
                if e.FACTORY == "videoconvert"][0]
        assert conv.src_pads()[0].caps[0]["format"] == "RGB"


class TestRun:
    def test_videotestsrc_to_appsink(self):
        p = parse_launch(
            "videotestsrc num-buffers=3 pattern=smpte75 ! videoconvert ! "
            "video/x-raw,format=RGB,width=320,height=240 ! appsink name=out")
        sink = p.get_by_name("out")
        p.run()
        assert p.bus.pop_filtered("eos") is not None
        samples = []
        while True:
            s = sink.pull_sample()
            if s is None:
                break
            samples.append(s)
        assert sum(s.buffer.batch for s in samples) == 3
        arr = np.asarray(samples[0].buffer.data[0])
        assert arr.shape[-3:] == (240, 320, 1) or arr.shape[-2:] == (240, 320)

    def test_convert_scale_chain(self):
        p = parse_launch(
            "videotestsrc num-buffers=2 ! videoconvert ! videoscale ! "
            "video/x-raw,format=RGB,width=64,height=48 ! fakesink name=sink")
        sink = p.get_by_name("sink")
        p.run()
        assert sink.n_rendered == 2
        r = np.asarray(sink.last_buffer.data[0])
        assert r.shape[-2:] == (48, 64)

    def test_num_buffers_eos(self):
        p = parse_launch("videotestsrc num-buffers=5 ! fakesink name=s")
        p.run()
        assert p.get_by_name("s").n_rendered == 5
        assert p.bus.pop_filtered("eos") is not None

    def test_batched_ticks(self):
        p = parse_launch("videotestsrc num-buffers=8 ! fakesink name=s",
                         batch=4)
        p.run()
        assert p.get_by_name("s").n_rendered == 8

    def test_timestamps(self):
        p = parse_launch("videotestsrc num-buffers=3 ! appsink name=out")
        sink = p.get_by_name("out")
        p.run()
        pts = [sink.pull_sample().buffer.pts for _ in range(3)]
        assert pts == [0, 33333333, 66666666]

    def test_appsrc_pipeline(self):
        p = parse_launch(
            "appsrc name=in caps=video/x-raw,format=RGB,width=4,height=4 ! "
            "videoconvert ! video/x-raw,format=BGR ! appsink name=out")
        src = p.get_by_name("in")
        rgb = (np.arange(4 * 4 * 3) % 256).astype(np.uint8).reshape(1, 4, 4, 3)
        planes = (rgb[..., 0], rgb[..., 1], rgb[..., 2])
        src.push_buffer(Buffer(data=planes, pts=0, batch=1))
        p.run()
        s = p.get_by_name("out").pull_sample()
        b = np.asarray(s.buffer.data[2])   # B plane comes first in BGR? no:
        # planes are component-ordered (R, G, B) regardless of layout
        np.testing.assert_array_equal(np.asarray(s.buffer.data[0]), rgb[..., 0])

    def test_snow_runs(self):
        p = parse_launch(
            "videotestsrc num-buffers=2 pattern=snow ! appsink name=out")
        sink = p.get_by_name("out")
        p.run()
        a = np.asarray(sink.pull_sample().buffer.data[0])
        b = np.asarray(sink.pull_sample().buffer.data[0])
        # successive snow frames must differ (LCG advances across frames)
        assert not np.array_equal(a, b)

    def test_tee_two_sinks(self):
        p = parse_launch(
            "videotestsrc num-buffers=2 ! tee name=t "
            "t. ! queue ! fakesink name=a t. ! queue ! fakesink name=b")
        p.run()
        assert p.get_by_name("a").n_rendered == 2
        assert p.get_by_name("b").n_rendered == 2


class TestParse:
    def test_parse_errors(self):
        with pytest.raises(Exception):
            parse_launch("nosuchelement ! fakesink")
        with pytest.raises(Exception):
            parse_launch("videotestsrc !")

    def test_named_ref_requires_existing(self):
        with pytest.raises(Exception):
            parse_launch("foo. ! fakesink")


class TestCompositor:
    def test_blend_math_exact(self):
        import numpy as np
        from gstreamer_tpu.ops import blend as b
        # compositor_orc_blend_u8: d = clamp_u8((d<<8 + (s-d)*a)>>8)
        d = np.array([100], np.int32)
        s = np.array([200], np.int32)
        assert b.blend_plane(np, d, s, 255)[0] == ((100 << 8) + 100 * 255) >> 8
        assert b.blend_plane(np, d, s, 0)[0] == 100
        # div255w emulation
        assert b.div255w(np, np.array([255 * 255]))[0] == 255
        assert b.div255w(np, np.array([0]))[0] == 0

    def test_mosaic_2x2(self):
        import numpy as np
        p = parse_launch(
            "compositor name=c background=black "
            "sink_0::xpos=0 sink_0::ypos=0 sink_1::xpos=64 sink_1::ypos=0 "
            "sink_2::xpos=0 sink_2::ypos=48 sink_3::xpos=64 sink_3::ypos=48 "
            "! video/x-raw,format=I420,width=128,height=96 ! appsink name=o "
            "videotestsrc num-buffers=1 pattern=white ! "
            "video/x-raw,format=I420,width=64,height=48 ! c.sink_0 "
            "videotestsrc num-buffers=1 pattern=red ! "
            "video/x-raw,format=I420,width=64,height=48 ! c.sink_1 "
            "videotestsrc num-buffers=1 pattern=blue ! "
            "video/x-raw,format=I420,width=64,height=48 ! c.sink_2 "
            "videotestsrc num-buffers=1 pattern=green ! "
            "video/x-raw,format=I420,width=64,height=48 ! c.sink_3 ")
        sink = p.get_by_name("o")
        p.run()
        s = sink.pull_sample()
        y = np.asarray(s.buffer.data[0])[0]   # batch of 1
        assert y.shape == (96, 128)
        # white quadrant luma 235; red quadrant bt601 red Y=81
        assert y[10, 10] == 235
        assert y[10, 100] == 81
        assert y[80, 10] == 41     # blue
        assert y[80, 100] == 145   # green

    def test_alpha_blend(self):
        import numpy as np
        p = parse_launch(
            "compositor name=c background=black sink_0::alpha=0.5 "
            "! video/x-raw,format=I420,width=32,height=32 ! appsink name=o "
            "videotestsrc num-buffers=1 pattern=white ! "
            "video/x-raw,format=I420,width=32,height=32 ! c.sink_0")
        sink = p.get_by_name("o")
        p.run()
        y = np.asarray(sink.pull_sample().buffer.data[0])[0]
        # blend_u8 with alpha=127: (16<<8 + (235-16)*127)>>8 = 124
        assert y[5, 5] == ((16 << 8) + (235 - 16) * 127) >> 8


class TestVideoFilters:
    def test_videobalance_identity_passthrough(self):
        p = parse_launch(
            "videotestsrc num-buffers=1 ! videobalance ! fakesink name=s")
        p.run()
        assert p.get_by_name("s").n_rendered == 1

    def test_videobalance_brightness(self):
        p = parse_launch(
            "videotestsrc num-buffers=1 pattern=black ! "
            "video/x-raw,format=I420,width=16,height=16 ! "
            "videobalance brightness=0.5 ! appsink name=o")
        sink = p.get_by_name("o")
        p.run()
        y = np.asarray(sink.pull_sample().buffer.data[0])[0]
        # y' = rint(16 + (16-16)*1 + 0.5*255) = 144 (reference LUT math)
        assert y[0, 0] == 144

    def test_videoflip_rotate(self):
        p = parse_launch(
            "videotestsrc num-buffers=1 ! video/x-raw,format=I420,"
            "width=32,height=16 ! videoflip method=clockwise ! appsink name=o")
        sink = p.get_by_name("o")
        p.run()
        y = np.asarray(sink.pull_sample().buffer.data[0])
        assert y.shape[-2:] == (32, 16)

    def test_videocrop(self):
        p = parse_launch(
            "videotestsrc num-buffers=1 ! video/x-raw,format=I420,"
            "width=64,height=48 ! videocrop top=8 bottom=8 left=16 right=16 "
            "! appsink name=o")
        sink = p.get_by_name("o")
        p.run()
        y = np.asarray(sink.pull_sample().buffer.data[0])
        assert y.shape[-2:] == (32, 32)

    def test_gamma(self):
        p = parse_launch(
            "videotestsrc num-buffers=1 pattern=white ! video/x-raw,"
            "format=I420,width=8,height=8 ! gamma gamma=2.0 ! appsink name=o")
        sink = p.get_by_name("o")
        p.run()
        y = np.asarray(sink.pull_sample().buffer.data[0])[0]
        import numpy as _np
        expect = int(_np.clip(_np.rint((235 / 255.0) ** 0.5 * 255), 0, 255))
        assert y[0, 0] == expect

    def test_videorate_upsample(self):
        p = parse_launch(
            "videotestsrc num-buffers=4 ! video/x-raw,format=I420,"
            "width=16,height=16,framerate=15/1 ! videorate ! "
            "video/x-raw,framerate=30/1 ! fakesink name=s", batch=4)
        p.run()
        vr = [e for e in p.iterate_elements() if e.FACTORY == "videorate"][0]
        assert p.get_by_name("s").n_rendered >= 7
        assert vr.dup_count >= 3

    def test_videorate_downsample(self):
        p = parse_launch(
            "videotestsrc num-buffers=8 ! video/x-raw,format=I420,"
            "width=16,height=16,framerate=30/1 ! videorate ! "
            "video/x-raw,framerate=15/1 ! fakesink name=s", batch=8)
        p.run()
        assert p.get_by_name("s").n_rendered == 4

    def test_deinterlace_chain(self):
        # BASELINE configs[3] shape: deinterlace ! videorate ! videobalance
        p = parse_launch(
            "videotestsrc num-buffers=4 ! video/x-raw,format=I420,"
            "width=64,height=48,framerate=30/1 ! deinterlace method=yadif ! "
            "videorate ! videobalance saturation=1.2 ! fakesink name=s",
            batch=4)
        p.run()
        # fields=all doubles the frame count; videorate halves it back to
        # the negotiated rate? (60fps after deinterlace stays 60) — just
        # check frames flowed
        assert p.get_by_name("s").n_rendered >= 4

    def test_deinterlace_linear_flat(self):
        p = parse_launch(
            "videotestsrc num-buffers=1 pattern=white ! video/x-raw,"
            "format=I420,width=16,height=16 ! deinterlace method=linear "
            "fields=top ! appsink name=o")
        sink = p.get_by_name("o")
        p.run()
        y = np.asarray(sink.pull_sample().buffer.data[0])[0]
        assert (y == 235).all()   # flat field stays flat


class TestFileIO:
    def test_y4m_roundtrip(self, tmp_path):
        import numpy as np
        # write a small y4m by hand, read it through the pipeline
        w, h = 32, 16
        path = tmp_path / "test.y4m"
        rng = np.random.default_rng(0)
        frames = [rng.integers(0, 256, w * h * 3 // 2, dtype=np.uint8)
                  for _ in range(3)]
        with open(path, "wb") as f:
            f.write(b"YUV4MPEG2 W32 H16 F30:1 Ip A1:1 C420jpeg\n")
            for fr in frames:
                f.write(b"FRAME\n")
                f.write(fr.tobytes())
        p = parse_launch(f"filesrc location={path} ! appsink name=o")
        sink = p.get_by_name("o")
        p.run()
        total = 0
        while (s := sink.pull_sample()) is not None:
            total += s.buffer.batch
            y = np.asarray(s.buffer.data[0])
        assert total == 3
        assert y.shape[-2:] == (16, 32)
        np.testing.assert_array_equal(
            y[-1].reshape(-1), frames[-1][:w * h])

    def test_raw_video_file(self, tmp_path):
        import numpy as np
        w, h = 16, 8
        path = tmp_path / "raw.rgb"
        data = np.arange(w * h * 3 * 2, dtype=np.uint64) % 256
        with open(path, "wb") as f:
            f.write(data.astype(np.uint8).tobytes())
        p = parse_launch(
            f"filesrc location={path} "
            f"caps=video/x-raw,format=RGB,width=16,height=8,framerate=30/1 "
            f"! appsink name=o", batch=2)
        sink = p.get_by_name("o")
        p.run()
        s = sink.pull_sample()
        assert s.buffer.batch == 2

    def test_filesink_roundtrip(self, tmp_path):
        import numpy as np
        out = tmp_path / "out.i420"
        p = parse_launch(
            f"videotestsrc num-buffers=2 ! video/x-raw,format=I420,"
            f"width=32,height=16 ! filesink location={out}")
        p.run()
        sz = out.stat().st_size
        assert sz == 2 * (32 * 16 * 3 // 2)


class TestNativeIO:
    def test_native_y4m_reader(self, tmp_path):
        from gstreamer_tpu.native.io import available, NativeY4MReader
        if not available():
            import pytest
            pytest.skip("no native toolchain")
        w, h = 32, 16
        path = tmp_path / "n.y4m"
        rng = np.random.default_rng(1)
        frames = [rng.integers(0, 256, w * h * 3 // 2, dtype=np.uint8)
                  for _ in range(5)]
        with open(path, "wb") as f:
            f.write(b"YUV4MPEG2 W32 H16 F25:1 Ip A1:1 C420jpeg\n")
            for fr in frames:
                f.write(b"FRAME\n" + fr.tobytes())
        r = NativeY4MReader(str(path), batch=2)
        assert r.info.width == 32 and r.info.n_frames == 5
        r.start()
        got = []
        while (res := r.next_batch()) is not None:
            batch, first = res
            got.extend(batch)
        r.close()
        assert len(got) == 5
        np.testing.assert_array_equal(got[3], frames[3])

    def test_filesrc_uses_native(self, tmp_path):
        w, h = 16, 8
        path = tmp_path / "m.y4m"
        rng = np.random.default_rng(2)
        frames = [rng.integers(0, 256, w * h * 3 // 2, dtype=np.uint8)
                  for _ in range(4)]
        with open(path, "wb") as f:
            f.write(b"YUV4MPEG2 W16 H8 F30:1\n")
            for fr in frames:
                f.write(b"FRAME\n" + fr.tobytes())
        p = parse_launch(f"filesrc location={path} ! appsink name=o", batch=2)
        sink = p.get_by_name("o")
        p.run()
        total = 0
        while (s := sink.pull_sample()) is not None:
            total += s.buffer.batch
        assert total == 4


class TestSeek:
    def test_videotestsrc_seek(self):
        p = parse_launch("videotestsrc num-buffers=10 ! appsink name=o")
        p.compile()
        p.seek(100_000_000)   # 100ms @30fps = frame 3
        p.run()
        sink = p.get_by_name("o")
        pts = sink.pull_sample().buffer.pts
        assert pts == 3_000_000_000 // 30   # frame 3 (gst_util_uint64_scale)

    def test_filesrc_seek(self, tmp_path):
        w, h = 8, 8
        path = tmp_path / "s.y4m"
        with open(path, "wb") as f:
            f.write(b"YUV4MPEG2 W8 H8 F10:1\n")
            for i in range(10):
                f.write(b"FRAME\n")
                f.write(bytes([i]) * (w * h * 3 // 2))
        p = parse_launch(f"filesrc location={path} ! appsink name=o")
        p.compile()
        p.set_state("playing")
        p.seek(500_000_000)   # 0.5s @10fps = frame 5
        p.run()
        sink = p.get_by_name("o")
        first = np.asarray(sink.pull_sample().buffer.data[0])
        assert first.ravel()[0] == 5

    def test_audiotestsrc_seek_phase(self):
        p = parse_launch(
            "audiotestsrc num-buffers=1 samplesperbuffer=100 ! appsink name=o")
        p.compile()
        p.set_state("playing")
        p.seek(1_000_000_000)
        p.run()
        sink = p.get_by_name("o")
        buf = sink.pull_sample().buffer
        assert buf.pts == 1_000_000_000


class TestValidate:
    def test_monitor_clean_pipeline(self):
        from gstreamer_tpu.validate import PipelineMonitor
        p = parse_launch("videotestsrc num-buffers=3 ! videoconvert ! "
                         "video/x-raw,format=RGB ! fakesink")
        mon = PipelineMonitor(p)
        p.run()
        assert mon.ok, mon.violations

    def test_scenario_seek(self):
        from gstreamer_tpu.validate import PipelineMonitor, Scenario
        p = parse_launch("videotestsrc num-buffers=10 ! fakesink name=s")
        mon = PipelineMonitor(p)
        p.compile()
        sc = Scenario(actions=[(3, lambda pp: (pp.seek(0),
                                               mon.reset_timestamps()))],
                      max_ticks=20)
        sc.run(p)
        # seek back to 0 at tick 3 -> extra frames rendered
        assert p.get_by_name("s").n_rendered >= 10
        assert mon.ok, mon.violations


class TestAux:
    def test_discoverer_y4m(self, tmp_path):
        from gstreamer_tpu.utils.discoverer import Discoverer
        path = tmp_path / "d.y4m"
        with open(path, "wb") as f:
            f.write(b"YUV4MPEG2 W64 H48 F25:1\n")
            for _ in range(25):
                f.write(b"FRAME\n" + bytes(64 * 48 * 3 // 2))
        info = Discoverer().discover(str(path))
        v = info.video_streams[0]
        assert (v.width, v.height) == (64, 48)
        assert info.duration_ns == 1_000_000_000

    def test_discoverer_wav(self, tmp_path):
        import struct
        from gstreamer_tpu.utils.discoverer import Discoverer
        path = tmp_path / "d.wav"
        data = b"\x00\x00" * 48000
        hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
               + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 48000,
                                       96000, 2, 16)
               + b"data" + struct.pack("<I", len(data)))
        path.write_bytes(hdr + data)
        info = Discoverer().discover(str(path))
        a = info.audio_streams[0]
        assert a.rate == 48000 and a.channels == 1 and a.format == "S16LE"
        assert info.duration_ns == 1_000_000_000

    def test_presets(self, tmp_path, monkeypatch):
        monkeypatch.setenv("GTPU_PRESET_PATH", str(tmp_path))
        from gstreamer_tpu.core import preset
        from gstreamer_tpu.core.element import element_factory_make
        e = element_factory_make("videobalance", contrast=1.5)
        preset.save_preset(e, "high-contrast")
        e2 = element_factory_make("videobalance")
        assert preset.load_preset(e2, "high-contrast")
        assert e2.get_property("contrast") == 1.5
        assert "high-contrast" in preset.get_preset_names("videobalance")
        assert preset.delete_preset("videobalance", "high-contrast")

    def test_controller_lfo_and_interpolation(self):
        from gstreamer_tpu.core.controller import (
            Controller, InterpolationControlSource, LFOControlSource)
        from gstreamer_tpu.core.element import element_factory_make
        e = element_factory_make("volume")
        ctrl = Controller()
        src = InterpolationControlSource()
        src.set(0, 0.0)
        src.set(1_000_000_000, 1.0)
        ctrl.bind(e, "volume", src)
        ctrl.sync_values(500_000_000)
        assert abs(e.get_property("volume") - 0.5) < 1e-9
        lfo = LFOControlSource(frequency=2.0)
        assert abs(lfo.value_at(0) - 0.5) < 1e-9


class TestPlayback:
    def test_typefind_file(self, tmp_path):
        from gstreamer_tpu.utils.typefind import type_find_file
        p1 = tmp_path / "a.y4m"
        p1.write_bytes(b"YUV4MPEG2 W8 H8 F30:1\nFRAME\n" + bytes(96))
        assert type_find_file(str(p1))[0] == "application/x-yuv4mpeg"
        p2 = tmp_path / "a.png"
        p2.write_bytes(b"\x89PNG\r\n\x1a\n" + bytes(16))
        assert type_find_file(str(p2))[0] == "image/png"

    def test_uridecodebin_y4m(self, tmp_path):
        path = tmp_path / "u.y4m"
        with open(path, "wb") as f:
            f.write(b"YUV4MPEG2 W16 H8 F30:1\n")
            for _ in range(2):
                f.write(b"FRAME\n" + bytes(16 * 8 * 3 // 2))
        p = parse_launch(f"uridecodebin uri=file://{path} ! appsink name=o")
        sink = p.get_by_name("o")
        p.run()
        total = 0
        while (s := sink.pull_sample()) is not None:
            total += s.buffer.batch
        assert total == 2

    def test_playbin_wav(self, tmp_path):
        out = tmp_path / "p.wav"
        parse_launch(f"audiotestsrc num-buffers=2 ! wavenc location={out}"
                     ).run()
        from gstreamer_tpu.core.element import element_factory_make
        pb = element_factory_make("playbin", uri=f"file://{out}")
        pipe, sink = pb.build_pipeline()
        pipe.run()
        assert sink.pull_sample() is not None


class TestParseBins:
    def test_bin_in_chain(self):
        from gstreamer_tpu.core.parse import parse_launch
        pipe = parse_launch(
            "videotestsrc num-buffers=2 ! "
            "( videoconvert ! video/x-raw,format=RGB ) ! appsink name=o")
        pipe.run()
        import numpy as np
        s = pipe.get_by_name("o").pull_sample()
        assert s is not None
        assert len(s.buffer.data) == 3   # RGB planes

    def test_nested_bin_named_elements(self):
        from gstreamer_tpu.core.parse import parse_launch
        pipe = parse_launch(
            "videotestsrc num-buffers=1 ! "
            "( identity name=inner ! ( identity name=deep ) ) ! "
            "fakesink name=sink")
        assert pipe.get_by_name("inner") is not None
        assert pipe.get_by_name("deep") is not None
        pipe.run()

    def test_unbalanced_paren_raises(self):
        from gstreamer_tpu.core.parse import parse_launch, ParseError
        import pytest as _pytest
        with _pytest.raises(ParseError):
            parse_launch("videotestsrc ! ( identity ! fakesink")


class TestDeviceMonitor:
    def test_enumerates_devices(self):
        from gstreamer_tpu.core.device import DeviceMonitor
        mon = DeviceMonitor()
        mon.start()
        devs = mon.get_devices()
        assert any(d.device_class.startswith("Compute/") for d in devs)
        assert any(d.device_class == "Source/Video" for d in devs)
        mon.stop()

    def test_class_filter(self):
        from gstreamer_tpu.core.device import DeviceMonitor
        mon = DeviceMonitor()
        mon.add_filter(classes="Source/Video")
        devs = mon.get_devices()
        assert devs and all(d.has_classes("Source/Video") for d in devs)

    def test_device_creates_element(self):
        from gstreamer_tpu.core.device import DeviceMonitor
        mon = DeviceMonitor()
        mon.add_filter(classes="Source/Video")
        el = mon.get_devices()[0].create_element()
        assert el.FACTORY == "videotestsrc"

    def test_caps_filter(self):
        from gstreamer_tpu.core.caps import Caps
        from gstreamer_tpu.core.device import DeviceMonitor
        mon = DeviceMonitor()
        mon.add_filter(caps=Caps.from_string("audio/x-raw"))
        devs = mon.get_devices()
        assert all("audio" in str(d.caps) for d in devs)


class TestY4mEnc:
    def test_y4m_roundtrip(self, tmp_path):
        from gstreamer_tpu.core.parse import parse_launch
        import numpy as np
        path = tmp_path / "out.y4m"
        pipe = parse_launch(
            f"videotestsrc pattern=smpte num-buffers=3 ! "
            f"video/x-raw,format=I420,width=64,height=32,framerate=25/1 ! "
            f"y4menc location={path}")
        pipe.run()
        head = path.read_bytes()[:64]
        assert head.startswith(b"YUV4MPEG2 C420jpeg W64 H32 Ip F25:1 A1:1\n")
        # read it back through filesrc
        pipe2 = parse_launch(f"filesrc location={path} ! appsink name=o")
        pipe2.run()
        sink = pipe2.get_by_name("o")
        n = 0
        first = None
        while True:
            s = sink.pull_sample()
            if s is None:
                break
            y = np.asarray(s.buffer.data[0])
            if first is None:
                first = y[0]
            n += y.shape[0]
        assert n == 3
        # compare against a direct capture of frame 0
        pipe3 = parse_launch(
            "videotestsrc pattern=smpte num-buffers=1 ! "
            "video/x-raw,format=I420,width=64,height=32,framerate=25/1 ! "
            "appsink name=o")
        pipe3.run()
        ref = np.asarray(pipe3.get_by_name("o").pull_sample().buffer.data[0])[0]
        assert np.array_equal(first, ref)


class TestInterlace:
    def test_2_2_passthrough_content_sets_tff(self):
        from gstreamer_tpu.core.buffer import BufferFlags
        from gstreamer_tpu.core.parse import parse_launch
        import numpy as np
        pipe = parse_launch(
            "videotestsrc pattern=gradient num-buffers=2 ! "
            "video/x-raw,format=GRAY8,width=16,height=8,framerate=30/1 ! "
            "interlace field-pattern=2:2 top-field-first=true ! "
            "appsink name=o")
        pipe.run()
        s = pipe.get_by_name("o").pull_sample()
        assert s.buffer.flags & BufferFlags.INTERLACED_TFF

    def test_1_1_weaves_fields_from_pairs(self):
        from gstreamer_tpu.core.buffer import Buffer
        from gstreamer_tpu.core.parse import parse_launch
        import numpy as np
        pipe = parse_launch(
            "appsrc name=in caps=video/x-raw,format=GRAY8,width=8,height=4,"
            "framerate=60/1 ! interlace field-pattern=1:1 ! appsink name=o")
        f0 = np.full((1, 4, 8), 10, np.uint8)
        f1 = np.full((1, 4, 8), 200, np.uint8)
        frames = np.concatenate([f0, f1])
        pipe.get_by_name("in").push_buffer(
            Buffer(data=(frames,), pts=0, duration=16666666, batch=2))
        pipe.get_by_name("in").end_of_stream()
        pipe.run()
        out = np.asarray(pipe.get_by_name("o").pull_sample().buffer.data[0])
        assert out.shape[0] == 1
        # default BFF: even rows (top field) from frame 2, odd from frame 1
        assert int(out[0, 0, 0]) == 200
        assert int(out[0, 1, 0]) == 10


class TestMiscSources:
    def test_dataurisrc_base64(self):
        import base64
        from gstreamer_tpu.core.parse import parse_launch
        payload = base64.b64encode(b"hello tpu").decode()
        pipe = parse_launch(
            f"dataurisrc uri=data:application/octet-stream;base64,{payload} "
            f"! appsink name=o")
        pipe.run()
        import numpy as np
        s = pipe.get_by_name("o").pull_sample()
        assert bytes(np.asarray(s.buffer.data)) == b"hello tpu"

    def test_fdsrc_fdsink_roundtrip(self, tmp_path):
        import os
        from gstreamer_tpu.core.parse import parse_launch
        src_path = tmp_path / "in.bin"
        src_path.write_bytes(bytes(range(200)))
        out_path = tmp_path / "out.bin"
        rfd = os.open(src_path, os.O_RDONLY)
        wfd = os.open(out_path, os.O_WRONLY | os.O_CREAT)
        pipe = parse_launch(f"fdsrc fd={rfd} blocksize=64 ! fdsink fd={wfd}")
        pipe.run()
        os.close(rfd)
        os.close(wfd)
        assert out_path.read_bytes() == bytes(range(200))


class TestTagsAndPromise:
    def test_taglist_merge_modes(self):
        from gstreamer_tpu.core.tags import (MERGE_APPEND, MERGE_KEEP,
                                             MERGE_PREPEND,
                                             MERGE_REPLACE_ALL, TagList)
        a = TagList(title="A", artist="x")
        b = TagList(title="B", album="y")
        m = a.merge(b, MERGE_APPEND)
        assert m.get("title") == "A"       # single-valued keeps first
        assert m.get("album") == "y"
        r = a.merge(b, MERGE_REPLACE_ALL)
        assert r.get("title") == "B" and "artist" not in r
        k = TagList()
        k.add(MERGE_KEEP, "title", "first")
        k.add(MERGE_KEEP, "title", "second")
        assert k.get("title") == "first"
        p = TagList()
        p.add(MERGE_APPEND, "keyword", "a")
        p.add(MERGE_PREPEND, "keyword", "b")
        assert p.get_all("keyword") == ["b", "a"]

    def test_promise_lifecycle(self):
        import threading
        from gstreamer_tpu.core.tags import Promise
        pr = Promise()
        threading.Timer(0.02, lambda: pr.reply({"answer": 42})).start()
        assert pr.wait(1.0) == Promise.REPLIED
        assert pr.get_reply()["answer"] == 42
        p2 = Promise()
        p2.interrupt()
        assert p2.wait(0.1) == Promise.INTERRUPTED
        p2.reply(1)     # post-interrupt reply ignored
        assert p2.result == Promise.INTERRUPTED


class TestBitstream:
    def test_byte_reader_writer_roundtrip(self):
        from gstreamer_tpu.core.bitstream import ByteReader, ByteWriter
        w = ByteWriter()
        w.put_uint8(0xAB)
        w.put_uint16_le(0x1234)
        w.put_uint32_be(0xDEADBEEF)
        w.put_float64_le(3.5)
        w.put_data(b"xyz")
        data = w.reset_and_get_data()
        r = ByteReader(data)
        assert r.get_uint8() == 0xAB
        assert r.get_uint16_le() == 0x1234
        assert r.get_uint32_be() == 0xDEADBEEF
        assert r.get_float64_le() == 3.5
        assert r.get_data(3) == b"xyz"
        assert r.get_uint8() is None

    def test_masked_scan(self):
        from gstreamer_tpu.core.bitstream import ByteReader
        r = ByteReader(b"\x00\x00\x00\x01\x67\x42")
        assert r.masked_scan_uint32(0xFFFFFFFF, 0x00000167, 0) == 1
        assert r.masked_scan_uint32(0xFFFFFF00, 0x00000100, 0) == 1
        assert r.masked_scan_uint32(0xFFFFFFFF, 0x12345678, 0) == -1

    def test_bit_reader_writer(self):
        from gstreamer_tpu.core.bitstream import BitReader, BitWriter
        w = BitWriter()
        w.put_bits(0b101, 3)
        w.put_bits(0x7F, 7)
        w.align_bytes(1)
        data = w.get_data()
        r = BitReader(data)
        assert r.get_bits(3) == 0b101
        assert r.get_bits(7) == 0x7F
        assert r.get_bits(6) == 0b111111   # alignment fill

    def test_flow_combiner(self):
        from gstreamer_tpu.core.bitstream import FlowCombiner
        from gstreamer_tpu.core.buffer import FlowReturn
        fc = FlowCombiner()
        assert fc.update_flow("a", FlowReturn.OK) == FlowReturn.OK
        assert fc.update_flow("b", FlowReturn.EOS) == FlowReturn.OK
        assert fc.update_flow("a", FlowReturn.EOS) == FlowReturn.EOS
        assert fc.update_flow("b", FlowReturn.ERROR) == FlowReturn.ERROR
        fc.reset()
        assert fc.update_flow("a", FlowReturn.NOT_LINKED) \
            == FlowReturn.NOT_LINKED


class TestTelecine:
    """gstinterlace.c pulldown state machine (formats table :364)."""

    @staticmethod
    def _mk(pattern, n, h=8, w=8, fps=(24, 1), **props):
        from gstreamer_tpu.core.caps import Structure
        from gstreamer_tpu.core.value import Fraction
        from gstreamer_tpu.elements.interlace import Interlace
        e = Interlace(**{"field-pattern": pattern, **props})
        s = Structure("video/x-raw", format="GRAY8", width=w, height=h,
                      framerate=Fraction(*fps))
        e.set_info([s], None)
        e.start()
        frames = [np.full((h, w), 10 * (i + 1), np.uint8) for i in range(n)]
        outs = []
        for i, f in enumerate(frames):
            b = Buffer(data=(f[None],), pts=i * 1_000_000_000 // fps[0],
                       duration=1_000_000_000 // fps[0], batch=1)
            r = e.host_process(b)
            if r is not None:
                for j in range(r.batch):
                    outs.append((np.asarray(r.data[0][j]),
                                 r.meta["frames"][j]))
        return frames, outs

    def test_2_3_pulldown(self):
        from gstreamer_tpu.core.buffer import BufferFlags
        frames, outs = self._mk("2:3", 4)
        # 24p A B C D -> 30i A, B, B|C, C|D, D (2:3 pulldown)
        assert len(outs) == 5
        a, b, c, d = frames
        assert (outs[0][0] == a).all()
        assert (outs[1][0] == b).all()
        # weave: odd rows (field_index=1, not tff) from stored frame
        assert (outs[2][0][1::2] == b[1::2]).all()
        assert (outs[2][0][0::2] == c[0::2]).all()
        assert outs[2][1]["flags"] & BufferFlags.INTERLACED
        assert (outs[3][0][1::2] == c[1::2]).all()
        assert (outs[3][0][0::2] == d[0::2]).all()
        assert (outs[4][0] == d).all()
        assert not outs[0][1]["flags"] & BufferFlags.INTERLACED
        # 24 fps in -> 30 fps out: duration = 2 fields at 1/60s
        assert outs[0][1]["duration"] == 2 * 1_000_000_000 // 60
        assert outs[1][1]["pts"] == 1_000_000_000 * 2 // 60

    def test_2_3_allow_rff(self):
        from gstreamer_tpu.core.buffer import BufferFlags
        frames, outs = self._mk("2:3", 4, **{"allow-rff": True})
        # every 3-field frame collapses into one RFF buffer: A B(rff) C D(rff)
        assert len(outs) == 4
        rff = [bool(o[1]["flags"] & BufferFlags.RFF) for o in outs]
        assert rff == [False, True, False, True]
        assert outs[1][1]["duration"] == 3 * 1_000_000_000 // 60

    def test_1_1_weave(self):
        frames, outs = self._mk("1:1", 4, fps=(60, 1))
        # 60p -> 30-frame 60i: each output weaves two successive frames
        assert len(outs) == 2
        a, b, c, d = frames
        assert (outs[0][0][1::2] == a[1::2]).all()
        assert (outs[0][0][0::2] == b[0::2]).all()
        assert (outs[1][0][1::2] == c[1::2]).all()
        assert (outs[1][0][0::2] == d[0::2]).all()

    def test_euro_pulldown_counts(self):
        # 2-11:3: 12 input frames -> 25 fields -> 12 output frames + 1 stored
        frames, outs = self._mk("2-11:3", 24, fps=(24, 1))
        # over 24 frames: 50 fields -> 25 output frames
        assert len(outs) == 25

    def test_2_2_passthrough_content(self):
        frames, outs = self._mk("2:2", 3, fps=(30, 1))
        assert len(outs) == 3
        for f, (o, _) in zip(frames, outs):
            assert (o == f).all()


class TestDynamicProperties:
    """Control-bound DYNAMIC_PROPS compile as per-tick device inputs:
    animation without recompiles (the gstcontrolbinding sync path,
    redesigned TPU-first)."""

    def test_volume_ramp_single_compile(self):
        import numpy as np
        from gstreamer_tpu.core.controller import \
            InterpolationControlSource
        from gstreamer_tpu.core.parse import parse_launch

        p = parse_launch(
            "audiotestsrc wave=sine freq=440 num-buffers=10 "
            "samplesperbuffer=1000 ! "
            "audio/x-raw,format=F32LE,rate=10000,channels=1 ! "
            "volume name=v ! appsink name=o")
        v = p.get_by_name("v")
        src = InterpolationControlSource()
        src.set(0, 0.0)
        src.set(1_000_000_000, 1.0)
        v.set_control_source("volume", src)
        p.run()
        sink = p.get_by_name("o")
        peaks = []
        while (s := sink.pull_sample()) is not None:
            peaks.append(float(np.abs(np.asarray(s.buffer.data)).max()))
        assert len(peaks) == 10
        # monotone ramp (audiotestsrc's own 0.8 gain scales it)
        assert peaks[0] < 0.05
        assert peaks[-1] > 0.6
        assert all(b >= a - 1e-3 for a, b in zip(peaks, peaks[1:]))
        assert p.compile_count == 1          # no recompiles

    def test_int_path_dynamic_volume(self):
        import numpy as np
        from gstreamer_tpu.core.controller import \
            InterpolationControlSource
        from gstreamer_tpu.core.parse import parse_launch

        p = parse_launch(
            "audiotestsrc wave=sine num-buffers=4 "
            "samplesperbuffer=500 ! "
            "audio/x-raw,format=S16LE,rate=2000,channels=1 ! "
            "volume name=v ! appsink name=o")
        src = InterpolationControlSource()
        src.set(0, 0.25)
        src.set(1_000_000_000, 0.25)
        p.get_by_name("v").set_control_source("volume", src)
        p.run()
        sink = p.get_by_name("o")
        got = []
        while (s := sink.pull_sample()) is not None:
            got.append(np.asarray(s.buffer.data))
        full = np.concatenate(got).ravel()
        # constant 0.25 via the Q27 integer path
        assert 0.15 * 0.8 * 32767 < np.abs(full).max() < 0.3 * 32767

    def test_videobalance_dynamic_matches_static(self):
        import numpy as np
        from gstreamer_tpu.core.controller import \
            InterpolationControlSource
        from gstreamer_tpu.core.parse import parse_launch

        vals = (("contrast", 1.3), ("saturation", 0.5),
                ("hue", 0.2), ("brightness", -0.1))
        p_static = parse_launch(
            "videotestsrc num-buffers=1 pattern=gradient ! "
            "video/x-raw,format=I420,width=32,height=16,"
            "framerate=5/1 ! videobalance "
            + " ".join(f"{k}={v}" for k, v in vals)
            + " ! appsink name=o")
        p_static.run()
        g1 = [np.asarray(x) for x in
              p_static.get_by_name("o").pull_sample().buffer.data]

        p_dyn = parse_launch(
            "videotestsrc num-buffers=1 pattern=gradient ! "
            "video/x-raw,format=I420,width=32,height=16,"
            "framerate=5/1 ! videobalance name=vb ! appsink name=o")
        vb = p_dyn.get_by_name("vb")
        for prop, val in vals:
            cs = InterpolationControlSource()
            cs.set(0, val)
            cs.set(10 ** 9, val)
            vb.set_control_source(prop, cs)
        p_dyn.run()
        g2 = [np.asarray(x) for x in
              p_dyn.get_by_name("o").pull_sample().buffer.data]
        for a, b in zip(g1, g2):
            np.testing.assert_array_equal(a, b)

    def test_videobalance_keyframed_fade_to_black(self):
        import numpy as np
        from gstreamer_tpu.core.controller import \
            InterpolationControlSource
        from gstreamer_tpu.core.parse import parse_launch

        p = parse_launch(
            "videotestsrc num-buffers=5 pattern=gradient ! "
            "video/x-raw,format=I420,width=32,height=16,"
            "framerate=5/1 ! videobalance name=vb ! appsink name=o")
        src = InterpolationControlSource()
        src.set(0, 0.0)
        src.set(1_000_000_000, -1.0)
        p.get_by_name("vb").set_control_source("brightness", src)
        p.run()
        sink = p.get_by_name("o")
        means = []
        while (s := sink.pull_sample()) is not None:
            means.append(float(np.asarray(s.buffer.data[0]).mean()))
        assert means[0] > means[-1] + 20
        assert p.compile_count == 1
