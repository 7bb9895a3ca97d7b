"""Zero-copy ingest seam: input-buffer donation (the GstBufferPool
recycling analog, gstbufferpool.c:125) and double-buffered prefetch
staging (the queue-decoupling analog, gstqueue.c:211)."""

import numpy as np

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.core.pipeline import State
from gstreamer_tpu.core.query import allocation_query


def _pipe():
    return parse_launch(
        "appsrc name=in caps=video/x-raw,format=I420,width=64,height=48,"
        "framerate=30/1 ! videoconvert ! videoscale ! "
        "video/x-raw,format=RGB,width=32,height=24 ! appsink name=s")


def _push_n(p, n, seed=0):
    rng = np.random.default_rng(seed)
    src = p.get_by_name("in")
    bufs = []
    for k in range(n):
        data = (rng.integers(0, 256, (2, 48, 64), np.uint8),
                rng.integers(0, 256, (2, 24, 32), np.uint8),
                rng.integers(0, 256, (2, 24, 32), np.uint8))
        bufs.append(data)
        src.push_buffer(Buffer(data=data, pts=k, batch=2))
    return bufs


def _drain(p):
    sink = p.get_by_name("s")
    outs = []
    while len(sink):
        s = sink.pull_sample()
        outs.append(tuple(np.asarray(x) for x in s.buffer.data))
    return outs


def test_donated_inputs_bit_equal():
    gold_p = _pipe()
    _push_n(gold_p, 4)
    gold_p.set_state(State.PLAYING)
    while gold_p.tick():
        pass
    gold = _drain(gold_p)

    p = _pipe()
    _push_n(p, 4)
    p.compile(batch=2, donate_inputs=True)
    p.set_state(State.PLAYING)
    while p.tick():
        pass
    got = _drain(p)
    assert len(got) == len(gold) == 4
    for g, x in zip(gold, got):
        for a, b in zip(g, x):
            np.testing.assert_array_equal(a, b)


def test_prefetch_staging_order_and_eos():
    gold_p = _pipe()
    _push_n(gold_p, 5, seed=3)
    gold_p.set_state(State.PLAYING)
    while gold_p.tick():
        pass
    gold = _drain(gold_p)

    p = _pipe()
    _push_n(p, 5, seed=3)
    p.compile(batch=2, prefetch=True)
    p.set_state(State.PLAYING)
    while p.tick():
        pass
    got = _drain(p)
    assert len(got) == 5
    for g, x in zip(gold, got):
        for a, b in zip(g, x):
            np.testing.assert_array_equal(a, b)


def test_prefetch_with_caps_switch():
    p = _pipe()
    src, sink = p.get_by_name("in"), p.get_by_name("s")
    rng = np.random.default_rng(9)
    src.push_buffer(Buffer(data=(
        rng.integers(0, 256, (2, 48, 64), np.uint8),
        rng.integers(0, 256, (2, 24, 32), np.uint8),
        rng.integers(0, 256, (2, 24, 32), np.uint8)), pts=0, batch=2))
    src.set_caps("video/x-raw,format=I420,width=128,height=96,"
                 "framerate=30/1")
    src.push_buffer(Buffer(data=(
        rng.integers(0, 256, (2, 96, 128), np.uint8),
        rng.integers(0, 256, (2, 48, 64), np.uint8),
        rng.integers(0, 256, (2, 48, 64), np.uint8)), pts=1, batch=2))
    p.compile(batch=2, prefetch=True)
    p.set_state(State.PLAYING)
    n = 0
    while p.tick():
        n += 1
        assert n < 10
    outs = _drain(p)
    assert len(outs) == 2
    for o in outs:
        assert all(x.shape[-2:] == (24, 32) for x in o)


def test_allocation_query():
    p = _pipe()
    _push_n(p, 1)
    p.compile(batch=2, donate_inputs=True, prefetch=True)
    q = allocation_query(None)
    assert p.query(q)
    assert q.result["donate-inputs"] and q.result["prefetch"]
    assert q.result["device-staging"]
