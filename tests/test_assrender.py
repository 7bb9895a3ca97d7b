"""assrender: ASS style parsing, override tags, placement and styled
blending (reduced libass re-spec,
gst-plugins-bad/ext/assrender/gstassrender.c)."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.assrender import (AssStyle, parse_ass_styles,
                                              parse_dialogue, place)

HEADER = """[Script Info]
PlayResX: 640
PlayResY: 480

[V4+ Styles]
Format: Name, Fontname, Fontsize, PrimaryColour, Bold, Italic, Underline, Alignment, MarginL, MarginR, MarginV
Style: Default,DejaVu Sans,24,&H00FFFFFF,0,0,0,2,10,10,20
Style: Red,DejaVu Sans,30,&H000000FF,1,0,0,8,10,10,12
"""


class TestParsing:
    def test_styles(self):
        styles = parse_ass_styles(HEADER)
        assert styles["Default"].fontsize == 24
        assert styles["Default"].alignment == 2
        assert styles["Red"].primary == (255, 0, 0)   # &H..BBGGRR
        assert styles["Red"].bold
        assert styles["Red"].alignment == 8
        assert styles["Red"].margin_v == 12

    def test_dialogue_tags(self):
        styles = parse_ass_styles(HEADER)
        ev = parse_dialogue(
            r"Dialogue: 0,0:00:01.00,0:00:03.00,Default,,0,0,0,,"
            r"plain {\b1}bold{\b0} {\i1}it{\i0} "
            r"{\c&H0000FF&}red{\c&HFFFFFF&} end", styles)
        assert ev.start_ns == 1_000_000_000
        assert ev.end_ns == 3_000_000_000
        runs = [r for line in ev.text_runs for r in line]
        texts = [r.text for r in runs]
        assert "".join(texts) == "plain bold it red end"
        bold_runs = [r for r in runs if r.bold]
        assert [r.text for r in bold_runs] == ["bold"]
        assert [r.text for r in runs if r.italic] == ["it"]
        red = [r for r in runs if r.color == (255, 0, 0)]
        assert [r.text for r in red] == ["red"]

    def test_pos_and_an(self):
        styles = parse_ass_styles(HEADER)
        ev = parse_dialogue(
            r"Dialogue: 0,0:00:00.00,0:00:01.00,Default,,0,0,0,,"
            r"{\an7}{\pos(100,50)}top", styles)
        assert ev.alignment == 7
        assert ev.pos == (100, 50)
        assert place(ev, 40, 20, 640, 480) == (80, 40)

    def test_linebreaks(self):
        styles = parse_ass_styles(HEADER)
        ev = parse_dialogue(
            r"Dialogue: 0,0:00:00.00,0:00:01.00,Default,,0,0,0,,"
            r"line one\Nline two", styles)
        assert len(ev.text_runs) == 2

    def test_alignment_placement(self):
        ev = parse_dialogue(
            r"Dialogue: 0,0:00:00.00,0:00:01.00,Default,,0,0,0,,x",
            {"Default": AssStyle(alignment=2, margin_v=20)})
        x, y = place(ev, 100, 30, 640, 480)
        assert x == 270          # centered
        assert y == 480 - 30 - 20


def _i420(n, h, w, y=16, u=128, v=128):
    return (np.full((n, h, w), y, np.uint8),
            np.full((n, h // 2, w // 2), u, np.uint8),
            np.full((n, h // 2, w // 2), v, np.uint8))


def run_overlay(element, doc, h=240, w=320):
    p = parse_launch(
        f"{element} name=ov ! appsink name=out "
        f"appsrc name=v ! video/x-raw, format=I420, width={w}, "
        f"height={h}, framerate=30/1 ! ov.video "
        f"appsrc name=t ! application/x-ass ! ov.text")
    p.get_by_name("v").push_buffer(Buffer(data=_i420(1, h, w),
                                          batch=1, pts=0))
    p.get_by_name("t").push_buffer(Buffer(
        data=np.frombuffer(doc.encode(), np.uint8), pts=0))
    p.get_by_name("v").end_of_stream()
    p.get_by_name("t").end_of_stream()
    p.run()
    s = p.get_by_name("out").pull_sample()
    return [np.asarray(x)[0] for x in s.buffer.data]


DOC = HEADER + """
[Events]
Format: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text
Dialogue: 0,0:00:00.00,0:00:02.00,Default,,0,0,0,,Hello styled world
"""


class TestRendering:
    def test_blend_bottom_center(self):
        y, u, v = run_overlay("assrender", DOC)
        drawn = y > 100
        assert drawn.any()
        ys, xs = np.nonzero(drawn)
        assert ys.mean() > 160            # bottom
        assert 60 < xs.mean() < 260       # centered-ish

    def test_red_style_colors_chroma(self):
        doc = HEADER + """
[Events]
Format: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text
Dialogue: 0,0:00:00.00,0:00:02.00,Red,,0,0,0,,TOP RED
"""
        y, u, v = run_overlay("assrender", doc)
        drawn = y > 60
        assert drawn.any()
        ys, xs = np.nonzero(drawn)
        assert ys.mean() < 100            # alignment 8 = top
        # red text drives V (Cr) up in the drawn region
        assert float(v[ys // 2, xs // 2].mean()) > 150

    def test_disable_passthrough(self):
        y, u, v = run_overlay("assrender enable=false", DOC)
        assert (y == 16).all()

    def test_subtitleoverlay_routes_ass(self):
        y, u, v = run_overlay("subtitleoverlay", DOC)
        assert (y > 100).any()
