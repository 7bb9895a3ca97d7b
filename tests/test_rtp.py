"""RTP raw-video (RFC 4175) and L16 audio payload/depayload roundtrips."""

import numpy as np

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.core.pipeline import State


def test_vraw_roundtrip():
    W, H, B = 64, 48, 2
    tx = parse_launch(
        f"appsrc name=in caps=video/x-raw,format=RGB,width={W},height={H},"
        "framerate=30/1 ! rtpvrawpay mtu=900 ! appsink name=s")
    rng = np.random.default_rng(0)
    planes = tuple(rng.integers(0, 256, (B, H, W), np.uint8)
                   for _ in range(3))
    tx.get_by_name("in").push_buffer(
        Buffer(data=planes, pts=0, duration=33333333, batch=B))
    tx.set_state(State.PLAYING)
    assert tx.tick()
    pkts = tx.get_by_name("s").pull_sample().buffer.data
    assert isinstance(pkts, list) and len(pkts) > B   # multiple per frame
    assert all(len(p) <= 900 for p in pkts)

    rx = parse_launch(
        "appsrc name=in caps=application/x-rtp ! rtpvrawdepay "
        f"caps=video/x-raw,format=RGB,width={W},height={H},"
        "framerate=30/1 ! appsink name=s")
    rx.get_by_name("in").push_buffer(Buffer(data=pkts, pts=0, batch=1))
    rx.set_state(State.PLAYING)
    assert rx.tick()
    out = rx.get_by_name("s").pull_sample().buffer
    assert out.batch == B
    for a, b in zip(planes, out.data):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_l16_roundtrip():
    tx = parse_launch(
        "appsrc name=in caps=audio/x-raw,format=S16LE,rate=48000,"
        "channels=2,layout=interleaved ! rtpL16pay mtu=400 ! appsink name=s")
    rng = np.random.default_rng(1)
    x = rng.integers(-32768, 32767, (1000, 2), np.int16)
    tx.get_by_name("in").push_buffer(Buffer(data=x, pts=0, batch=1))
    tx.set_state(State.PLAYING)
    assert tx.tick()
    pkts = tx.get_by_name("s").pull_sample().buffer.data
    assert len(pkts) > 5

    rx = parse_launch(
        "appsrc name=in caps=application/x-rtp ! rtpL16depay "
        "caps=audio/x-raw,format=S16LE,rate=48000,channels=2,"
        "layout=interleaved ! appsink name=s")
    rx.get_by_name("in").push_buffer(Buffer(data=pkts, pts=0, batch=1))
    rx.set_state(State.PLAYING)
    assert rx.tick()
    out = np.asarray(rx.get_by_name("s").pull_sample().buffer.data)
    np.testing.assert_array_equal(out, x)


def test_vraw_over_udp():
    """Full wire: pay -> udpsink ==> udpsrc -> depay."""
    import time
    W, H = 32, 16
    rxp = parse_launch("udpsrc name=u port=0 timeout=2.0 ! appsink name=s")
    rxp.set_state(State.PLAYING)
    port = rxp.get_by_name("u").bound_port

    tx = parse_launch(
        f"appsrc name=in caps=video/x-raw,format=RGB,width={W},height={H},"
        f"framerate=30/1 ! rtpvrawpay mtu=1200 ! udpsink port={port}")
    rng = np.random.default_rng(2)
    planes = tuple(rng.integers(0, 256, (1, H, W), np.uint8)
                   for _ in range(3))
    tx.get_by_name("in").push_buffer(Buffer(data=planes, pts=0, batch=1))
    tx.set_state(State.PLAYING)
    assert tx.tick()
    time.sleep(0.1)

    got = []
    while rxp.tick():
        sink = rxp.get_by_name("s")
        while len(sink):
            got.append(np.asarray(sink.pull_sample().buffer.data).tobytes())
        if sum(len(g) >= 12 for g in got) >= 2 and len(got) >= 1:
            from gstreamer_tpu.net.rtp import parse_rtp_header
            if any(parse_rtp_header(g)["marker"] for g in got if len(g) > 12):
                break
    tx.set_state(State.NULL)
    rxp.set_state(State.NULL)

    rx = parse_launch(
        "appsrc name=in caps=application/x-rtp ! rtpvrawdepay "
        f"caps=video/x-raw,format=RGB,width={W},height={H},"
        "framerate=30/1 ! appsink name=s")
    rx.get_by_name("in").push_buffer(Buffer(data=got, pts=0, batch=1))
    rx.set_state(State.PLAYING)
    assert rx.tick()
    out = rx.get_by_name("s").pull_sample().buffer
    for a, b in zip(planes, out.data):
        np.testing.assert_array_equal(a, np.asarray(b))
