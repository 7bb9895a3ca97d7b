"""tcp/udp transport elements over localhost (gst/tcp, gst/udp analogs)."""

import threading
import time

import numpy as np

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.core.pipeline import State


def test_tcp_roundtrip():
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, 32768, np.uint8)

    srv = parse_launch("appsrc name=in caps=application/octet-stream ! tcpserversink name=snd port=0")
    snd = srv.get_by_name("snd")
    srv.get_by_name("in").push_buffer(Buffer(data=payload, batch=1))
    srv.set_state(State.PLAYING)          # starts listening
    port = snd.bound_port

    cli = parse_launch(
        f"tcpclientsrc port={port} blocksize=65536 timeout=2.0 ! "
        "appsink name=s")
    cli.set_state(State.PLAYING)
    time.sleep(0.15)                      # let accept_loop register us
    assert srv.tick()                     # send

    got = bytearray()
    while cli.tick():
        while len(cli.get_by_name("s")):
            s = cli.get_by_name("s").pull_sample()
            got += np.asarray(s.buffer.data).tobytes()
        if len(got) >= payload.nbytes:
            break
    srv.set_state(State.NULL)
    cli.set_state(State.NULL)
    assert bytes(got[:payload.nbytes]) == payload.tobytes()


def test_udp_roundtrip():
    rng = np.random.default_rng(1)
    payload = rng.integers(0, 256, 4000, np.uint8)

    rx = parse_launch("udpsrc name=r port=0 timeout=2.0 ! appsink name=s")
    rx.set_state(State.PLAYING)
    port = rx.get_by_name("r").bound_port

    tx = parse_launch(f"appsrc name=in caps=application/octet-stream ! udpsink port={port} mtu=1400")
    tx.get_by_name("in").push_buffer(Buffer(data=payload, batch=1))
    tx.set_state(State.PLAYING)
    assert tx.tick()

    got = bytearray()
    while len(got) < payload.nbytes and rx.tick():
        while len(rx.get_by_name("s")):
            s = rx.get_by_name("s").pull_sample()
            got += np.asarray(s.buffer.data).tobytes()
    tx.set_state(State.NULL)
    rx.set_state(State.NULL)
    assert bytes(got[:payload.nbytes]) == payload.tobytes()


def test_tcpserversrc_accepts_client():
    rx = parse_launch("tcpserversrc name=r port=0 timeout=2.0 ! "
                      "appsink name=s")
    rx.set_state(State.PLAYING)
    port = rx.get_by_name("r").bound_port

    tx = parse_launch(f"appsrc name=in caps=application/octet-stream ! tcpclientsink port={port}")
    data = np.arange(256, dtype=np.uint8)
    tx.get_by_name("in").push_buffer(Buffer(data=data, batch=1))

    def sender():
        time.sleep(0.1)
        tx.set_state(State.PLAYING)
        tx.tick()

    t = threading.Thread(target=sender)
    t.start()
    got = bytearray()
    while len(got) < 256 and rx.tick():
        while len(rx.get_by_name("s")):
            got += np.asarray(
                rx.get_by_name("s").pull_sample().buffer.data).tobytes()
    t.join()
    tx.set_state(State.NULL)
    rx.set_state(State.NULL)
    assert bytes(got[:256]) == data.tobytes()
