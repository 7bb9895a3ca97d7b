"""Device-side effectv: the converted effects run as lax.scan inside the
fused pipeline program (Element.make_scan_fn), with feedback state
carried in HBM across ticks.  Each must be bit-identical to the numpy
gold (_frame — the exact C port pinned by test_effectv.py), including
across tick boundaries (state continuity).
"""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.element import element_factory_make
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.core.pipeline import State

W, H = 32, 24
CONVERTED = ["edgetv", "streaktv", "shagadelictv", "vertigotv", "quarktv",
             "revtv", "dicetv", "warptv"]


def frames(n, seed):
    rng = np.random.default_rng(seed)
    return tuple(rng.integers(0, 256, (n, H, W), np.uint8)
                 for _ in range(3))


def run_device(factory, planes, ticks):
    p = parse_launch(
        f"appsrc name=in caps=video/x-raw,format=RGB,width={W},height={H},"
        f"framerate=30/1 ! {factory} ! appsink name=s")
    n = planes[0].shape[0]
    B = n // ticks
    src, sink = p.get_by_name("in"), p.get_by_name("s")
    for t in range(ticks):
        src.push_buffer(Buffer(
            data=tuple(pl[t * B:(t + 1) * B] for pl in planes),
            pts=t, batch=B))
    p.set_state(State.PLAYING)
    for _ in range(ticks):
        assert p.tick()
    outs = []
    while len(sink):
        s = sink.pull_sample()
        outs.append(tuple(np.asarray(x) for x in s.buffer.data))
    return tuple(np.concatenate([o[i] for o in outs], axis=0)
                 for i in range(3))


def run_gold(factory, planes):
    from gstreamer_tpu.core.caps import Caps
    e = element_factory_make(factory)
    caps = Caps.from_string(
        f"video/x-raw,format=RGB,width={W},height={H},framerate=30/1")
    e.set_info(caps, caps)
    e.start()
    buf = e.host_process(Buffer(data=planes, pts=0,
                                batch=planes[0].shape[0]))
    return tuple(np.asarray(x) for x in buf.data)


@pytest.mark.parametrize("factory", CONVERTED)
def test_device_matches_gold(factory):
    planes = frames(6, seed=hash(factory) % 1000)
    gold = run_gold(factory, planes)
    dev = run_device(factory, planes, ticks=1)
    for g, d in zip(gold, dev):
        np.testing.assert_array_equal(g, d, err_msg=factory)


@pytest.mark.parametrize("factory", ["streaktv", "vertigotv", "quarktv",
                                     "edgetv", "shagadelictv", "warptv"])
def test_state_continuity_across_ticks(factory):
    """2 ticks of 3 == 1 run of 6: HBM-carried state, not per-tick reset."""
    planes = frames(6, seed=99)
    gold = run_gold(factory, planes)
    dev = run_device(factory, planes, ticks=2)
    for g, d in zip(gold, dev):
        np.testing.assert_array_equal(g, d, err_msg=factory)


def test_effect_fused_with_convert():
    """The scan element fuses into one program with neighbors (no host
    boundary): videoconvert ! edgetv ! appsink stays fused."""
    p = parse_launch(
        f"appsrc name=in caps=video/x-raw,format=RGB,width={W},height={H},"
        f"framerate=30/1 ! edgetv ! appsink name=s")
    src = p.get_by_name("in")
    planes = frames(2, seed=1)
    src.push_buffer(Buffer(data=planes, pts=0, batch=2))
    p.compile(batch=2)
    assert p._fused
    p.set_state(State.PLAYING)
    assert p.tick()
