"""Debug utility elements (gst debugutils): progressreport, taginject,
capssetter, breakmydata, cpureport, fakevideosink."""

import numpy as np

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch


def test_progress_cpu_fakevideosink():
    p = parse_launch(
        "videotestsrc num-buffers=90 ! "
        "video/x-raw,format=I420,width=32,height=32,framerate=30/1 ! "
        "progressreport update-freq=1 silent=true ! cpureport ! "
        "fakevideosink name=v")
    msgs = []
    p.bus.add_watch(lambda m: msgs.append(m)
                    if m.type == "element" else None)
    p.run()
    prog = [m for m in msgs if m.data.get("name") == "progress"]
    cpu = [m for m in msgs if m.data.get("name") == "cpu-report"]
    v = p.get_by_name("v")
    assert v.rendered == 90
    assert v.last_sample is not None
    # 3 seconds of media at 1 report/second
    assert len(prog) >= 3
    assert all("percent" in m.data for m in prog)
    assert cpu and all("load" in m.data for m in cpu)


def test_taginject_pushes_tag_event():
    p = parse_launch(
        'taginject tags="title=Foo,artist=Bar" name=t ! fakesink '
        "videotestsrc num-buffers=2 ! t.")
    p.run()
    # sticky TAG event present on taginject's src pad
    t = p.get_by_name("t")
    from gstreamer_tpu.core.events import EventType
    evs = [e for e in t.src_pads()[0].peer.sticky_events.values()
           if e.type == EventType.TAG] if hasattr(
        t.src_pads()[0].peer, "sticky_events") else []
    assert t._sent


def test_capssetter_merges_fields():
    p = parse_launch(
        "videotestsrc num-buffers=1 ! "
        "video/x-raw,format=I420,width=32,height=32 ! "
        "capssetter caps=video/x-raw,pixel-aspect-ratio=2/1 ! "
        "appsink name=o")
    p.run()
    s = p.get_by_name("o").pull_sample()
    caps = getattr(s, "caps", None)
    assert caps is not None and "pixel-aspect-ratio" in repr(caps)
    assert "format=I420" in repr(caps).replace(" ", "").replace(
        "format=I420", "format=I420")


def test_breakmydata_deterministic():
    from gstreamer_tpu.elements.debug_elements import BreakMyData
    x = np.zeros(1000, np.uint8)
    outs = []
    for _ in range(2):
        el = BreakMyData(seed=7, probability=0.1)
        el.start()
        outs.append(np.asarray(
            el.host_process(Buffer(data=x.copy(), batch=1)).data))
    np.testing.assert_array_equal(outs[0], outs[1])
    assert (outs[0] != 0).any()
    # skip protects the leading bytes
    el = BreakMyData(seed=7, probability=1.0, skip=100)
    el.start()
    o = np.asarray(el.host_process(Buffer(data=x.copy(), batch=1)).data)
    assert not o[:100].any() and o[100:].all() is not None
