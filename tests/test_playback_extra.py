"""decodebin3/playbin3/parsebin/playsink aliases, y4mdec, alphacolor,
dtmfdetect (gstalphacolor.c matrices, gstdtmfdetect.c)."""

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch


class TestAliases:
    def test_factories_exist(self):
        from gstreamer_tpu.core.element import element_factory_make
        for f in ("decodebin3", "playbin3", "parsebin", "playsink",
                  "y4mdec"):
            assert element_factory_make(f) is not None

    def test_y4mdec_reads_file(self, tmp_path):
        path = tmp_path / "t.y4m"
        p = parse_launch(
            f"videotestsrc num-buffers=3 ! video/x-raw,format=I420,"
            f"width=32,height=24,framerate=10/1 ! y4menc "
            f"location={path}")
        p.run()
        p.set_state("null")
        d = parse_launch(f"y4mdec location={path} ! appsink name=out")
        d.run()
        total = 0
        caps = None
        while (s := d.get_by_name("out").pull_sample()) is not None:
            caps = s.caps
            total += np.asarray(s.buffer.data[0]).shape[0]
        assert total == 3
        assert caps[0]["format"] == "I420"

    def test_playsink_counts(self):
        p = parse_launch("videotestsrc num-buffers=4 ! "
                         "video/x-raw,format=RGB,width=16,height=16 ! "
                         "playsink name=ps")
        p.run()
        ps = p.get_by_name("ps")
        assert ps.rendered["video"] == 4


class TestAlphaColor:
    def test_rgba_to_ayuv_scalar_gold(self):
        p = parse_launch(
            "videotestsrc num-buffers=1 pattern=smpte ! "
            "video/x-raw,format=RGBA,width=32,height=24 ! "
            "tee name=t t. ! appsink name=rgba t. ! alphacolor ! "
            "appsink name=ayuv")
        p.run()
        rgba = [np.asarray(x)[0]
                for x in p.get_by_name("rgba").pull_sample().buffer.data]
        s2 = p.get_by_name("ayuv").pull_sample()
        assert s2.caps[0]["format"] == "AYUV"
        got = [np.asarray(x)[0] for x in s2.buffer.data]
        r, g, b, a = [x.astype(np.int64) for x in rgba]
        # gstalphacolor.c:221-226 — no clamping, byte truncation
        y = ((r * 66 + g * 129 + b * 25 + 4096) >> 8) & 0xFF
        u = ((r * -38 + g * -74 + b * 112 + 32768) >> 8) & 0xFF
        v = ((r * 112 + g * -94 + b * -18 + 32768) >> 8) & 0xFF
        np.testing.assert_array_equal(got[0], y.astype(np.uint8))
        np.testing.assert_array_equal(got[1], u.astype(np.uint8))
        np.testing.assert_array_equal(got[2], v.astype(np.uint8))
        np.testing.assert_array_equal(got[3], rgba[3])

    def test_ayuv_to_rgba_clamps(self):
        p = parse_launch(
            "videotestsrc num-buffers=1 pattern=smpte ! "
            "video/x-raw,format=AYUV,width=32,height=24 ! "
            "tee name=t t. ! appsink name=ayuv t. ! alphacolor ! "
            "video/x-raw,format=RGBA ! appsink name=rgba")
        p.run()
        ayuv = [np.asarray(x)[0]
                for x in p.get_by_name("ayuv").pull_sample().buffer.data]
        got = [np.asarray(x)[0]
               for x in p.get_by_name("rgba").pull_sample().buffer.data]
        y, u, v, a = [x.astype(np.int64) for x in ayuv]
        r = np.clip((y * 298 + v * 409 - 57068) >> 8, 0, 255)
        g = np.clip((y * 298 + u * -100 + v * -208 + 34707) >> 8,
                    0, 255)
        b = np.clip((y * 298 + u * 516 - 70870) >> 8, 0, 255)
        np.testing.assert_array_equal(got[0], r.astype(np.uint8))
        np.testing.assert_array_equal(got[1], g.astype(np.uint8))
        np.testing.assert_array_equal(got[2], b.astype(np.uint8))
        np.testing.assert_array_equal(got[3], ayuv[3])


class TestDtmfDetect:
    @pytest.mark.parametrize("key,number", [("1", 1), ("0", 0),
                                            ("*", 10), ("#", 11),
                                            ("A", 12)])
    def test_detects_tone(self, key, number):
        p = parse_launch(
            f'dtmfsrc tones={key} tone-duration=300 ! dtmfdetect ! '
            f'fakesink')
        p.run()
        events = set()
        while (m := p.bus.pop()) is not None:
            if m.type == "element" and m.data.get("name") == "dtmf-event":
                events.add(m.data["number"])
                assert m.data["method"] == 2 and m.data["type"] == 1
        assert number in events

    def test_silence_no_events(self):
        p = parse_launch(
            "audiotestsrc num-buffers=5 samplesperbuffer=800 "
            "wave=silence ! audio/x-raw,format=S16LE,rate=8000,"
            "channels=1 ! dtmfdetect ! fakesink")
        p.run()
        while (m := p.bus.pop()) is not None:
            assert not (m.type == "element"
                        and m.data.get("name") == "dtmf-event")

    def test_passthrough(self):
        p = parse_launch(
            "dtmfsrc tones=3 tone-duration=100 ! tee name=t "
            "t. ! appsink name=a t. ! dtmfdetect ! appsink name=b")
        p.run()
        a = np.concatenate([np.asarray(s.buffer.data).ravel() for s in
                            iter(lambda: p.get_by_name("a")
                                 .pull_sample(), None)])
        b = np.concatenate([np.asarray(s.buffer.data).ravel() for s in
                            iter(lambda: p.get_by_name("b")
                                 .pull_sample(), None)])
        np.testing.assert_array_equal(a, b)
