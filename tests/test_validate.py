"""gst-validate analog: per-pad protocol monitors + scenario actions.

The monitor must catch deliberately broken elements
(gst-validate-pad-monitor.c checks: event ordering, caps fixedness,
timestamp regressions, invalid flow returns).
"""

import numpy as np

from gstreamer_tpu.core.buffer import Buffer, FlowReturn
from gstreamer_tpu.core.caps import Caps
from gstreamer_tpu.core.element import (PadDirection, PadTemplate,
                                        TransformElement, register_element)
from gstreamer_tpu.core.events import EventType, segment_event
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.core.pipeline import State
from gstreamer_tpu.validate.monitor import PipelineMonitor, Scenario


def _clean_pipeline():
    return parse_launch(
        "videotestsrc num-buffers=4 ! video/x-raw,format=I420,width=64,"
        "height=48,framerate=30/1 ! videoconvert ! "
        "video/x-raw,format=RGB ! appsink name=s")


def test_clean_pipeline_no_violations():
    p = _clean_pipeline()
    mon = PipelineMonitor(p)
    p.set_state(State.PLAYING)
    p.run()
    assert mon.ok, mon.report()


@register_element
class _BrokenPtsElement(TransformElement):
    """Deliberately broken: emits decreasing timestamps."""
    FACTORY = "testbrokenpts"
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, Caps.any()),
        PadTemplate("src", PadDirection.SRC, Caps.any()),
    ]

    def process_meta(self, buf):
        self._n = getattr(self, "_n", 0) + 1
        return buf.with_(pts=1_000_000_000 - self._n * 1_000_000)


def test_monitor_catches_timestamp_regression():
    p = parse_launch("videotestsrc num-buffers=4 ! testbrokenpts ! "
                     "appsink name=s")
    mon = PipelineMonitor(p)
    p.set_state(State.PLAYING)
    p.run()
    assert any(v.kind == "timestamp-regression" for v in mon.violations), \
        mon.report()


def test_pad_monitor_catches_event_misorder():
    """An element that pushes SEGMENT before CAPS violates the sticky
    event protocol (gstpad.c sticky order)."""
    p = _clean_pipeline()
    mon = PipelineMonitor(p)
    p.compile()
    # deliberately push a SEGMENT onto a fresh downstream pad before the
    # pipeline distributes STREAM_START/CAPS
    src = [e for e in p.iterate_elements()
           if e.FACTORY == "videotestsrc"][0]
    from gstreamer_tpu.core.segment import Segment
    src.src_pads()[0].push_event(segment_event(Segment()))
    p.set_state(State.PLAYING)
    assert any(v.kind == "event-order" for v in mon.violations), \
        mon.report()


def test_monitor_catches_invalid_flow_return():
    p = parse_launch("videotestsrc num-buffers=2 ! appsink name=s")
    mon = PipelineMonitor(p)
    sink = p.get_by_name("s")
    orig = sink.render
    sink.render = lambda buf: "banana"       # not a FlowReturn
    p.set_state(State.PLAYING)
    p.tick()
    assert any(v.kind == "invalid-flow-return" for v in mon.violations)
    sink.render = orig


def test_scenario_set_property_and_eos():
    p = parse_launch(
        "videotestsrc name=src num-buffers=100 ! video/x-raw,format=I420,"
        "width=32,height=32,framerate=30/1 ! videobalance name=vb ! "
        "video/x-raw ! appsink name=s")
    mon = PipelineMonitor(p)
    sc = Scenario(actions=[
        (1, Scenario.set_property("vb", "brightness", 0.2)),
        (3, Scenario.eos_injection()),
    ], max_ticks=20)
    sc.run(p)
    assert p.get_by_name("vb").get_property("brightness") == 0.2
    # eos happened well before num-buffers ran out
    assert len(p.get_by_name("s")) <= 5
    assert mon.ok, mon.report()


def test_scenario_caps_switch_action():
    p = parse_launch(
        "appsrc name=in caps=video/x-raw,format=I420,width=32,height=32,"
        "framerate=30/1 ! videoconvert ! video/x-raw,format=RGB ! "
        "appsink name=s")
    rng = np.random.default_rng(0)

    def planes(w, h):
        return (rng.integers(0, 256, (1, h, w), np.uint8),
                rng.integers(0, 256, (1, h // 2, w // 2), np.uint8),
                rng.integers(0, 256, (1, h // 2, w // 2), np.uint8))

    src = p.get_by_name("in")
    src.push_buffer(Buffer(data=planes(32, 32), pts=0, batch=1))
    mon = PipelineMonitor(p)

    def push_new(pipeline):
        src.push_buffer(Buffer(data=planes(64, 64), pts=1, batch=1))

    sc = Scenario(actions=[
        (1, Scenario.set_caps(
            "in", "video/x-raw,format=I420,width=64,height=64,"
            "framerate=30/1")),
        (1, push_new),
    ], max_ticks=5)
    sc.run(p)
    outs = []
    sink = p.get_by_name("s")
    while len(sink):
        outs.append(sink.pull_sample())
    assert len(outs) == 2
    assert mon.ok, mon.report()


def test_scenario_set_state_and_wait_and_rate_seek():
    """set-state / wait / seek-with-rate actions
    (gst-validate-scenario.h grammar additions)."""
    from gstreamer_tpu.validate.monitor import Scenario
    p = parse_launch("videotestsrc num-buffers=12 ! "
                     "video/x-raw,format=I420,width=32,height=24,"
                     "framerate=10/1 ! appsink name=out")
    sc = Scenario(actions=[
        (2, Scenario.wait(1)),
        (3, Scenario.seek(0, rate=2.0)),
        (5, Scenario.set_state("playing")),
    ], max_ticks=30)
    sc.run(p)
    # pipeline survived the whole action list and produced frames
    sink = p.get_by_name("out")
    total = 0
    while (s := sink.pull_sample()) is not None:
        total += s.buffer.batch
    assert total > 0


def test_scenario_appsrc_push_eos_and_check_position():
    """appsrc-push / appsrc-eos / check-position actions
    (gst-validate-scenario.c _execute_appsrc_push,
    _execute_check_position)."""
    from gstreamer_tpu.validate.monitor import Scenario
    rng = np.random.default_rng(5)

    def frame():
        return (rng.integers(0, 256, (1, 32, 32), np.uint8),
                rng.integers(0, 256, (1, 16, 16), np.uint8),
                rng.integers(0, 256, (1, 16, 16), np.uint8))

    p = parse_launch(
        "appsrc name=in caps=video/x-raw,format=I420,width=32,height=32,"
        "framerate=30/1 ! videoconvert ! video/x-raw,format=RGB ! "
        "appsink name=s")
    src = p.get_by_name("in")
    src.push_buffer(Buffer(data=frame(), pts=0, batch=1))
    checked = []

    def record_position(pipeline):
        checked.append(pipeline.query_position())

    sc = Scenario(actions=[
        (1, Scenario.appsrc_push("in", frame(),
                                 pts=33_333_333)),
        (2, record_position),
        (2, Scenario.check_position(66_666_666,
                                    tolerance_ns=70_000_000)),
        (2, Scenario.appsrc_eos("in")),
    ], max_ticks=10)
    sc.run(p)
    sink = p.get_by_name("s")
    total = 0
    while (s := sink.pull_sample()) is not None:
        total += s.buffer.batch
    assert total == 2               # both pushed frames came through
    assert checked and checked[0] is not None
    # a failing check raises
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        Scenario.check_position(10**12, tolerance_ns=0)(p)


def test_scenario_select_streams_zeroes_deselected(tmp_path):
    """select-streams action (switch-track analog): a deselected
    stream keeps its pad ticking but carries zeroed (muted) data —
    the batch-model reduction of decodebin3 SELECT_STREAMS."""
    from gstreamer_tpu.validate.monitor import Scenario
    path = tmp_path / "av.mkv"
    p = parse_launch(
        f"matroskamux name=m location={path} ! fakesink "
        "videotestsrc num-buffers=8 pattern=gradient ! "
        "video/x-raw,format=I420,width=32,height=32,framerate=25/1 ! "
        "m.video_0 "
        "audiotestsrc num-buffers=8 samplesperbuffer=1024 wave=sine ! "
        "audio/x-raw,format=S16LE,rate=48000,channels=2 ! m.audio_0")
    p.run()

    p2 = parse_launch(
        f"matroskademux name=d location={path} "
        "d.video_0 ! appsink name=v "
        "d.audio_0 ! appsink name=a")
    sc = Scenario(actions=[
        (0, Scenario.select_streams("d", ["video_0"])),
    ], max_ticks=50)
    sc.run(p2)
    abufs, vbufs = [], []
    while (s := p2.get_by_name("a").pull_sample()) is not None:
        abufs.append(np.asarray(s.buffer.data))
    while (s := p2.get_by_name("v").pull_sample()) is not None:
        vbufs.append(np.asarray(s.buffer.data[0]))
    assert abufs and vbufs
    assert all(not a.any() for a in abufs)      # muted audio
    assert any(v.any() for v in vbufs)          # video unaffected
    # reselect-all restores data
    d = p2.get_by_name("d")
    d.select_streams(None)
    assert d.stream_selected("audio_0")
