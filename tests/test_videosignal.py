"""simplevideomark/simplevideomarkdetect roundtrip."""

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch


def _detect_msgs(p):
    out = []
    while (m := p.bus.pop()) is not None:
        if m.type == "element" and \
                m.data.get("name") == "GstSimpleVideoMarkDetect":
            out.append(m.data)
    return out


class TestVideoMark:
    @pytest.mark.parametrize("word", [0, 10, 21, 31])
    def test_mark_detect_roundtrip(self, word):
        p = parse_launch(
            f"videotestsrc num-buffers=2 pattern=gradient ! "
            f"video/x-raw,format=I420,width=128,height=96 ! "
            f"simplevideomark pattern-data={word} ! "
            f"simplevideomarkdetect ! fakesink")
        p.run()
        msgs = _detect_msgs(p)
        assert len(msgs) == 2
        for m in msgs:
            assert m["have-pattern"] is True
            assert m["data"] == word

    def test_no_mark_no_pattern(self):
        p = parse_launch(
            "videotestsrc num-buffers=1 pattern=gradient ! "
            "video/x-raw,format=I420,width=128,height=96 ! "
            "simplevideomarkdetect ! fakesink")
        p.run()
        msgs = _detect_msgs(p)
        assert msgs and msgs[0]["have-pattern"] is False

    def test_disabled_mark_passthrough(self):
        a = parse_launch(
            "videotestsrc num-buffers=1 ! "
            "video/x-raw,format=I420,width=64,height=48 ! "
            "simplevideomark enabled=false ! appsink name=out")
        a.run()
        ya = np.asarray(a.get_by_name("out").pull_sample().buffer.data[0])
        b = parse_launch(
            "videotestsrc num-buffers=1 ! "
            "video/x-raw,format=I420,width=64,height=48 ! "
            "appsink name=out")
        b.run()
        yb = np.asarray(b.get_by_name("out").pull_sample().buffer.data[0])
        np.testing.assert_array_equal(ya, yb)

    def test_offsets(self):
        p = parse_launch(
            "videotestsrc num-buffers=1 pattern=gradient ! "
            "video/x-raw,format=I420,width=128,height=96 ! "
            "simplevideomark pattern-data=21 left-offset=20 "
            "bottom-offset=10 ! simplevideomarkdetect left-offset=20 "
            "bottom-offset=10 ! fakesink")
        p.run()
        msgs = _detect_msgs(p)
        assert msgs[0]["have-pattern"] is True
        assert msgs[0]["data"] == 21
