"""good_extras: aspectratiocrop, imagesequencesrc, splitfilesrc,
pushfilesrc, rndbuffersize, capsdebug, testsink, navseek."""

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch


class TestAspectRatioCrop:
    def test_crop_to_wider(self):
        p = parse_launch(
            'videotestsrc num-buffers=1 ! video/x-raw,format=I420,'
            'width=64,height=48 ! aspectratiocrop aspect-ratio=16/9 ! '
            'appsink name=out')
        p.run()
        s = p.get_by_name("out").pull_sample()
        assert (s.caps[0]["width"], s.caps[0]["height"]) == (64, 36)

    def test_crop_to_taller(self):
        p = parse_launch(
            'videotestsrc num-buffers=1 ! video/x-raw,format=I420,'
            'width=64,height=48 ! aspectratiocrop aspect-ratio=1/1 ! '
            'appsink name=out')
        p.run()
        s = p.get_by_name("out").pull_sample()
        assert (s.caps[0]["width"], s.caps[0]["height"]) == (48, 48)

    def test_passthrough_when_correct(self):
        p = parse_launch(
            'videotestsrc num-buffers=1 ! video/x-raw,format=I420,'
            'width=64,height=48 ! aspectratiocrop aspect-ratio=4/3 ! '
            'appsink name=out')
        p.run()
        s = p.get_by_name("out").pull_sample()
        assert (s.caps[0]["width"], s.caps[0]["height"]) == (64, 48)


class TestFileSources:
    def test_splitfilesrc_concatenates(self, tmp_path):
        for k, chunk in enumerate((b"AAAA", b"BB", b"CCCCCC")):
            (tmp_path / f"part{k}.bin").write_bytes(chunk)
        p = parse_launch(
            f"splitfilesrc location={tmp_path}/part*.bin ! "
            f"application/octet-stream ! appsink name=out")
        p.run()
        got = b""
        while (s := p.get_by_name("out").pull_sample()) is not None:
            got += np.asarray(s.buffer.data).tobytes()
        assert got == b"AAAABBCCCCCC"

    def test_imagesequencesrc(self, tmp_path):
        enc = parse_launch(
            f"videotestsrc num-buffers=3 ! video/x-raw,format=I420,"
            f"width=32,height=24 ! jpegenc ! multifilesink "
            f"location={tmp_path}/img_%d.jpg")
        enc.run()
        enc.set_state("null")
        p = parse_launch(
            f"imagesequencesrc location={tmp_path}/img_%d.jpg "
            f"framerate=5/1 ! jpegdec ! appsink name=out")
        p.run()
        frames = 0
        while (s := p.get_by_name("out").pull_sample()) is not None:
            frames += s.buffer.batch or 1
        assert frames == 3

    def test_pushfilesrc(self, tmp_path):
        (tmp_path / "d.bin").write_bytes(b"\x01\x02\x03\x04" * 100)
        p = parse_launch(
            f"pushfilesrc location={tmp_path}/d.bin "
            f"initial-timestamp=12345 ! application/octet-stream ! "
            f"appsink name=out")
        p.run()
        s = p.get_by_name("out").pull_sample()
        assert s.buffer.pts == 12345
        assert np.asarray(s.buffer.data).shape[0] == 400


class TestRndBufferSize:
    def test_content_preserved(self):
        p = parse_launch(
            "audiotestsrc num-buffers=5 samplesperbuffer=997 wave=saw "
            "! audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            "tee name=t t. ! testsink name=a "
            "t. ! rndbuffersize seed=7 min=17 max=333 ! testsink "
            "name=b")
        p.run()
        a, b = p.get_by_name("a"), p.get_by_name("b")
        assert a.md5 == b.md5
        assert a.byte_count == b.byte_count == 5 * 997 * 2

    def test_sizes_within_bounds(self):
        p = parse_launch(
            "audiotestsrc num-buffers=3 samplesperbuffer=1000 ! "
            "audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            "rndbuffersize seed=1 min=50 max=200 ! appsink name=out")
        p.run()
        sizes = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            d = s.buffer.data
            for b in (d if isinstance(d, (list, tuple)) else [d]):
                sizes.append(np.asarray(b).shape[0])
        # all but the EOS tail obey the bounds
        assert all(50 <= n <= 200 for n in sizes[:-1])
        assert sum(sizes) == 6000

    def test_deterministic_per_seed(self):
        def sizes(seed):
            p = parse_launch(
                f"audiotestsrc num-buffers=2 samplesperbuffer=1000 ! "
                f"audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
                f"rndbuffersize seed={seed} min=10 max=99 ! "
                f"appsink name=out")
            p.run()
            out = []
            while (s := p.get_by_name("out").pull_sample()) is not None:
                d = s.buffer.data
                for b in (d if isinstance(d, (list, tuple)) else [d]):
                    out.append(np.asarray(b).shape[0])
            return out
        assert sizes(5) == sizes(5)
        assert sizes(5) != sizes(6)


class TestDebugSinks:
    def test_capsdebug_records(self):
        p = parse_launch(
            "videotestsrc num-buffers=1 ! video/x-raw,format=RGB,"
            "width=16,height=16 ! capsdebug name=cd ! appsink "
            "name=out")
        p.run()
        cd = p.get_by_name("cd")
        assert cd.seen_caps and "video/x-raw" in cd.seen_caps[0]

    def test_testsink_counts(self):
        p = parse_launch(
            "audiotestsrc num-buffers=4 samplesperbuffer=500 ! "
            "audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            "testsink name=ts")
        p.run()
        ts = p.get_by_name("ts")
        assert ts.byte_count == 4000
        assert len(ts.md5) == 32


class TestNavigation:
    def test_navseek_records(self):
        from gstreamer_tpu.core.element import element_factory_make
        from gstreamer_tpu.core.events import Event
        e = element_factory_make("navseek")
        ev = Event("navigation", {"key": "Right"})
        e.src_event(None, ev)
        e.src_event(None, Event("navigation", {"key": "Left"}))
        assert e.requested_seeks == [5.0, -5.0]
