"""SRT elements (gstsrtsink.c / gstsrtsrc.c via system libsrt):
caller->listener transfer, packetized RTP boundaries, encryption."""

import socket
import threading
import time

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.net import srt as srtmod
from gstreamer_tpu.net.srt import SRTSink, SRTSrc

needs_srt = pytest.mark.skipif(not srtmod.available(),
                               reason="system libsrt unavailable")


def _free_udp_port():
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _transfer(payloads, sink_props=None, src_props=None,
              expect_fail=False):
    port = _free_udp_port()
    src = SRTSrc(address="127.0.0.1", port=port, timeout=2.0,
                 **(src_props or {}))
    src.start()
    got = []

    def receiver():
        while True:
            buf = src.create(1)
            if buf is None:
                return
            got.append(np.asarray(buf.data).tobytes())
            if len(got) >= len(payloads):
                return

    th = threading.Thread(target=receiver, daemon=True)
    th.start()
    sink = SRTSink(address="127.0.0.1", port=port, mode="caller",
                   **(sink_props or {}))
    try:
        sink.start()
    except RuntimeError:
        if expect_fail:
            th.join(3.0)
            src.stop()
            return None
        raise
    time.sleep(0.1)
    for p in payloads:
        sink.render(Buffer(data=[p], batch=1))
    th.join(4.0)
    sink.stop()
    src.stop()
    return got


@needs_srt
def test_srt_caller_to_listener():
    rng = np.random.default_rng(3)
    payloads = [bytes(rng.integers(0, 256, 188 * 7, np.uint8))
                for _ in range(8)]
    got = _transfer(payloads)
    assert got == payloads        # message boundaries preserved


@needs_srt
def test_srt_raw_bytes_chunked():
    port = _free_udp_port()
    src = SRTSrc(address="127.0.0.1", port=port, timeout=2.0)
    src.start()
    chunks = []

    def receiver():
        while True:
            buf = src.create(1)
            if buf is None:
                return
            chunks.append(np.asarray(buf.data).tobytes())
            if sum(len(c) for c in chunks) >= 3000:
                return

    th = threading.Thread(target=receiver, daemon=True)
    th.start()
    sink = SRTSink(address="127.0.0.1", port=port, mode="caller")
    sink.start()
    time.sleep(0.1)
    data = bytes(range(256)) * 12         # 3072 B > one live payload
    sink.render(Buffer(data=np.frombuffer(data, np.uint8), batch=1))
    th.join(4.0)
    sink.stop()
    src.stop()
    assert b"".join(chunks) == data
    assert all(len(c) <= srtmod.LIVE_PAYLOAD for c in chunks)


@needs_srt
def test_srt_encrypted_link():
    rng = np.random.default_rng(4)
    payloads = [bytes(rng.integers(0, 256, 512, np.uint8))
                for _ in range(4)]
    pw = {"passphrase": "0123456789abcdef"}
    got = _transfer(payloads, sink_props=pw, src_props=pw)
    assert got == payloads


@needs_srt
def test_srt_wrong_passphrase_rejected():
    got = _transfer([b"x" * 64],
                    sink_props={"passphrase": "0123456789abcdef"},
                    src_props={"passphrase": "fedcba9876543210"},
                    expect_fail=True)
    assert not got


@needs_srt
def test_srt_uri_parsing():
    sink = SRTSink(uri="srt://10.0.0.9:9710?mode=caller&latency=250"
                       "&streamid=abc")
    host, port, mode = sink._conn_params("caller")
    assert (host, port, mode) == ("10.0.0.9", 9710, "caller")
    assert sink.props["latency"] == 250
    assert sink.props["streamid"] == "abc"
