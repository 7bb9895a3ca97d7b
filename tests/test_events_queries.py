"""Runtime event flow, queries, and mid-stream renegotiation.

Covers the reference machinery of gstevent.c (sticky events :905,
gst_pad_push_event :201), gstquery.c (:2936 POSITION/DURATION/LATENCY/
SEEKING/CAPS), and the RECONFIGURE -> renegotiate -> re-jit path
(gstbasetransform.c:1341 setcaps) in the trace-time runtime.
"""

import os

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.events import EventType, gap_event
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.core.pipeline import State
from gstreamer_tpu.core.query import (QueryType, accept_caps_query,
                                      caps_query)


def _planes(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 256, (1, h, w), dtype=np.uint8),
            rng.integers(0, 256, (1, h // 2, w // 2), dtype=np.uint8),
            rng.integers(0, 256, (1, h // 2, w // 2), dtype=np.uint8))


def test_sticky_events_distributed():
    p = parse_launch("videotestsrc num-buffers=2 ! videoconvert ! "
                     "video/x-raw,format=RGB ! appsink name=s")
    p.set_state(State.PLAYING)
    conv = None
    for e in p.iterate_elements():
        if e.FACTORY == "videoconvert":
            conv = e
    sinkpad = conv.sink_pads()[0]
    assert sinkpad.get_sticky(EventType.STREAM_START) is not None
    assert sinkpad.get_sticky(EventType.CAPS) is not None
    assert sinkpad.get_sticky(EventType.SEGMENT) is not None
    # CAPS sticky matches the negotiated caps
    ev = sinkpad.get_sticky(EventType.CAPS)
    assert ev.data["caps"] == sinkpad.caps
    p.run()
    sink = p.get_by_name("s")
    assert sink.is_eos
    assert any(e.type == EventType.EOS for e in sink.events)


def test_appsrc_caps_switch_renegotiates():
    p = parse_launch(
        "appsrc name=in caps=video/x-raw,format=I420,width=64,height=32,"
        "framerate=30/1 ! videoconvert ! videoscale ! "
        "video/x-raw,format=RGB,width=32,height=16 ! appsink name=s")
    src = p.get_by_name("in")
    sink = p.get_by_name("s")
    src.push_buffer(Buffer(data=_planes(64, 32), pts=0, batch=1))
    src.set_caps("video/x-raw,format=I420,width=128,height=64,"
                 "framerate=30/1")
    src.push_buffer(Buffer(data=_planes(128, 64, seed=1), pts=1, batch=1))
    p.set_state(State.PLAYING)
    assert p.tick()          # old caps
    c0 = p.compile_count
    assert p.tick()          # marker -> renegotiate -> new caps
    assert p.compile_count == c0 + 1
    s1 = sink.pull_sample()
    s2 = sink.pull_sample()
    # both configs produced 32x16 RGB output
    for s in (s1, s2):
        for pl in s.buffer.data:
            assert np.asarray(pl).shape[-2:] == (16, 32)
    # output content differs between configs (real recompute, not reuse)
    assert not np.array_equal(np.asarray(s1.buffer.data[0]),
                              np.asarray(s2.buffer.data[0]))

    # switching BACK to the first caps config must hit the program cache
    src.set_caps("video/x-raw,format=I420,width=64,height=32,"
                 "framerate=30/1")
    src.push_buffer(Buffer(data=_planes(64, 32), pts=2, batch=1))
    c1 = p.compile_count
    assert p.tick()
    assert p.compile_count == c1          # cache hit: no recompile
    # caps-changed messages were posted
    assert any(m.type == "caps-changed" for m in p.bus.messages())


def test_filesrc_location_switch_renegotiates(tmp_path):
    def write_y4m(path, w, h, n):
        with open(path, "wb") as f:
            f.write(f"YUV4MPEG2 W{w} H{h} F30:1 Ip A1:1 C420mpeg2\n"
                    .encode())
            rng = np.random.default_rng(w)
            for _ in range(n):
                f.write(b"FRAME\n")
                f.write(rng.integers(0, 256, w * h * 3 // 2,
                                     dtype=np.uint8).tobytes())

    a = str(tmp_path / "a.y4m")
    b = str(tmp_path / "b.y4m")
    write_y4m(a, 64, 32, 2)
    write_y4m(b, 128, 64, 2)
    p = parse_launch(
        f"filesrc name=f location={a} ! videoconvert ! videoscale ! "
        "video/x-raw,format=RGB,width=32,height=16 ! appsink name=s")
    sink = p.get_by_name("s")
    p.set_state(State.PLAYING)
    assert p.tick()
    p.get_by_name("f").set_property("location", b)
    assert p.tick()          # renegotiated to 128x64 input
    assert len(sink) >= 2
    while len(sink):
        s = sink.pull_sample()
        for pl in s.buffer.data:
            assert np.asarray(pl).shape[-2:] == (16, 32)


def test_queries():
    p = parse_launch("videotestsrc num-buffers=8 ! "
                     "video/x-raw,format=I420,width=64,height=32,"
                     "framerate=30/1 ! videoconvert ! "
                     "video/x-raw,format=RGB ! appsink name=s")
    p.set_state(State.PLAYING)
    lat = p.query_latency()
    assert lat is not None and lat["min-latency"] > 0   # batch window
    p.tick()
    pos = p.query_position()
    assert pos is not None and pos > 0
    # CAPS / ACCEPT_CAPS on an element
    conv = [e for e in p.iterate_elements()
            if e.FACTORY == "videoconvert"][0]
    q = caps_query()
    assert conv.query(q)
    assert q.result["caps"] is not None
    from gstreamer_tpu.core.caps import Caps
    q2 = accept_caps_query(Caps.from_string("video/x-raw,format=I420"))
    assert conv.query(q2) and q2.result["accepted"]


def test_filesrc_duration_query(tmp_path):
    path = str(tmp_path / "d.y4m")
    with open(path, "wb") as f:
        f.write(b"YUV4MPEG2 W64 H32 F30:1 Ip A1:1 C420mpeg2\n")
        for _ in range(30):
            f.write(b"FRAME\n")
            f.write(np.zeros(64 * 32 * 3 // 2, np.uint8).tobytes())
    p = parse_launch(f"filesrc location={path} ! videoconvert ! "
                     "video/x-raw,format=RGB ! fakesink")
    p.set_state(State.PLAYING)
    dur = p.query_duration()
    assert dur == 1_000_000_000      # 30 frames at 30 fps


def test_gap_event_delivery():
    p = parse_launch(
        "appsrc name=in caps=video/x-raw,format=I420,width=64,height=32,"
        "framerate=30/1 ! videoconvert ! appsink name=s")
    src = p.get_by_name("in")
    sink = p.get_by_name("s")
    src.push_buffer(Buffer(data=_planes(64, 32), pts=0, batch=1))
    p.set_state(State.PLAYING)
    p.tick()
    src.push_gap(pts=33333333, duration=66666666)
    gaps = [e for e in sink.events if e.type == EventType.GAP]
    assert len(gaps) == 1
    assert gaps[0].data["duration"] == 66666666


def test_reconfigure_event_travels_upstream():
    p = parse_launch("videotestsrc num-buffers=2 ! videoconvert ! "
                     "appsink name=s")
    p.set_state(State.PLAYING)
    sink = p.get_by_name("s")
    from gstreamer_tpu.core.events import reconfigure_event
    sink.send_event(reconfigure_event())
    src = [e for e in p.iterate_elements()
           if e.FACTORY == "videotestsrc"][0]
    assert src._needs_reconfigure


def test_event_probe_consumes():
    p = parse_launch(
        "appsrc name=in caps=video/x-raw,format=I420,width=64,height=32,"
        "framerate=30/1 ! appsink name=s")
    src = p.get_by_name("in")
    sink = p.get_by_name("s")
    seen = []

    def probe(pad, ev):
        seen.append(ev.type)
        return None if ev.type == EventType.GAP else ev

    src.src_pads()[0].event_probes.append(probe)
    src.push_buffer(Buffer(data=_planes(64, 32), pts=0, batch=1))
    p.set_state(State.PLAYING)
    p.tick()
    src.push_gap(0, 1000)
    assert EventType.GAP in seen
    assert not any(e.type == EventType.GAP for e in sink.events)
