"""splitmuxsink fragment rotation + splitmuxsrc continuous playback."""

import glob

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch


def _run_sink(tmp_path, desc_extra="", n=10):
    pat = str(tmp_path / "frag%05d.mov")
    p = parse_launch(
        f"videotestsrc num-buffers={n} pattern=gradient ! "
        f"video/x-raw,format=UYVY,width=32,height=24,framerate=5/1 ! "
        f"splitmuxsink location={pat} {desc_extra}")
    p.run()
    p.set_state("null")
    return p, sorted(glob.glob(str(tmp_path / "frag*.mov")))


class TestSplitMuxSink:
    def test_splits_by_time(self, tmp_path):
        # 5 fps, 10 frames = 2s; 400ms fragments -> 2 frames each
        p, files = _run_sink(tmp_path, "max-size-time=400000000")
        assert len(files) == 5
        msgs = []
        while (m := p.bus.pop()) is not None:
            if m.type == "element" and str(
                    m.data.get("name", "")).startswith("splitmuxsink"):
                msgs.append(m.data["name"])
        assert msgs.count("splitmuxsink-fragment-opened") == 5
        assert msgs.count("splitmuxsink-fragment-closed") == 5

    def test_splits_by_bytes(self, tmp_path):
        fsz = 32 * 24 * 2          # UYVY frame bytes
        p, files = _run_sink(tmp_path, f"max-size-bytes={3 * fsz}")
        assert len(files) == 4     # ceil(10/3)
        # every fragment is a valid quicktime file
        for f in files:
            blob = open(f, "rb").read()
            assert blob[4:8] == b"ftyp"

    def test_single_file_when_no_limit(self, tmp_path):
        p, files = _run_sink(tmp_path)
        assert len(files) == 1


class TestSplitMuxSrc:
    def test_continuous_playback(self, tmp_path):
        _run_sink(tmp_path, "max-size-time=400000000")
        pat = str(tmp_path / "frag*.mov")
        d = parse_launch(
            f"splitmuxsrc location=\"{pat}\" ! appsink name=out")
        d.run()
        sink = d.get_by_name("out")
        frames, ptss = 0, []
        while (s := sink.pull_sample()) is not None:
            frames += np.asarray(s.buffer.data[0]).shape[0]
            ptss.append(s.buffer.pts)
        assert frames == 10
        # pts strictly increasing across fragment boundaries
        assert all(b > a for a, b in zip(ptss, ptss[1:]))

    def test_bit_exact_vs_direct(self, tmp_path):
        _run_sink(tmp_path, "max-size-time=400000000")
        pat = str(tmp_path / "frag*.mov")
        d = parse_launch(
            f"splitmuxsrc location=\"{pat}\" ! appsink name=out")
        d.run()
        got = []
        while (s := d.get_by_name("out").pull_sample()) is not None:
            got.append(np.asarray(s.buffer.data[0]))
        g = parse_launch(
            "videotestsrc num-buffers=10 pattern=gradient ! "
            "video/x-raw,format=UYVY,width=32,height=24,framerate=5/1 ! "
            "appsink name=out")
        g.run()
        want = []
        while (s := g.get_by_name("out").pull_sample()) is not None:
            want.append(np.asarray(s.buffer.data[0]))
        np.testing.assert_array_equal(np.concatenate(got),
                                      np.concatenate(want))
