"""dots-viewer (gst-devtools dots-viewer analog): render pipeline dot
dumps to standalone HTML/SVG without graphviz."""

import os

from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.tools.dotsviewer import (dot_to_svg, parse_dot,
                                            render_dir)
from gstreamer_tpu.utils.dot import pipeline_to_dot


def test_parse_and_render(tmp_path):
    p = parse_launch(
        "videotestsrc num-buffers=1 ! videoconvert ! tee name=t "
        "t. ! queue ! fakesink t. ! videoscale ! "
        "video/x-raw,width=8,height=8 ! fakesink")
    p.negotiate()
    text = pipeline_to_dot(p)
    nodes, edges = parse_dot(text)
    assert len(nodes) == 8
    assert len(edges) == 7
    svg = dot_to_svg(text, "test")
    assert svg.count("<rect") == 8
    assert svg.count("<path") == 7
    assert "videoconvert" in svg

    d = tmp_path / "dots"
    d.mkdir()
    (d / "a.dot").write_text(text)
    out = tmp_path / "page.html"
    n = render_dir(str(d), str(out))
    assert n == 1
    html = out.read_text()
    assert html.startswith("<!doctype html>")
    assert "<svg" in html and "tee" in html
