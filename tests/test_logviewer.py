"""debug-viewer analog (gst-devtools/debug-viewer): parse both log
dialects, filter, render HTML; end-to-end from a real GTPU_DEBUG run."""

import os
import subprocess
import sys

from gstreamer_tpu.tools.logviewer import (filter_lines, parse_line,
                                           parse_log, render_html)

GTPU_LINE = ("2026-01-02 03:04:05,678 DEBUG gtpu.pipeline: "
             "compiled 4 elements")
GST_LINE = ("0:00:00.123456789 12345 0x7f00deadbeef WARN "
            "videodecoder gstvideodecoder.c:2342:gst_video_decoder_"
            "sink_event:<theoradec0> error: no valid frames")


def test_parse_gtpu_dialect():
    ll = parse_line(GTPU_LINE)
    assert ll is not None
    assert ll.level == "DEBUG"
    assert ll.category == "pipeline"
    assert ll.message == "compiled 4 elements"


def test_parse_reference_dialect():
    ll = parse_line(GST_LINE)
    assert ll is not None
    assert ll.level == "WARNING"
    assert ll.category == "videodecoder"
    assert "no valid frames" in ll.message
    assert ll.location.startswith("gstvideodecoder.c:2342")


def test_multiline_folding_and_filters(tmp_path):
    p = tmp_path / "x.log"
    p.write_text(GTPU_LINE + "\n  continuation line\n"
                 + GST_LINE + "\n"
                 + GTPU_LINE.replace("DEBUG", "ERROR")
                            .replace("pipeline", "caps") + "\n")
    lines = parse_log(str(p))
    assert len(lines) == 3
    assert "continuation line" in lines[0].message
    assert [l.level for l in filter_lines(lines, level="WARNING")] \
        == ["WARNING", "ERROR"]
    assert [l.category for l in filter_lines(lines, category="pipe*")] \
        == ["pipeline"]
    assert len(filter_lines(lines, grep="valid frames")) == 1


def test_render_html(tmp_path):
    p = tmp_path / "x.log"
    p.write_text(GTPU_LINE + "\n" + GST_LINE + "\n")
    out = tmp_path / "view.html"
    render_html(parse_log(str(p)), str(out))
    text = out.read_text()
    assert "compiled 4 elements" in text
    assert "videodecoder" in text
    assert "<script>" in text            # live filters present


def test_end_to_end_from_real_run(tmp_path):
    """GTPU_DEBUG run -> log file -> viewer CLI -> HTML."""
    log = tmp_path / "run.log"
    env = dict(os.environ, GTPU_DEBUG="*:7",
               GTPU_DEBUG_FILE=str(log))
    # env JAX_PLATFORMS is not enough on this rig (the TPU plugin
    # rewrites it): force CPU in code
    code = ("import jax; jax.config.update('jax_platforms', 'cpu');"
            "import gstreamer_tpu as gt;"
            "p = gt.parse_launch('videotestsrc num-buffers=2 ! "
            "fakesink');"
            "p.run()")
    subprocess.run([sys.executable, "-c", code], env=env, check=True,
                   cwd="/root/repo", timeout=300)
    assert log.exists() and log.stat().st_size > 0
    from gstreamer_tpu.tools.logviewer import main
    out = tmp_path / "view.html"
    rc = main([str(log), "-o", str(out), "--level", "TRACE"])
    assert rc == 0
    assert out.exists()
    assert "<table" in out.read_text()
