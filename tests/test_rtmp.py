"""RTMP (gstrtmp2src.c / gstrtmp2sink.c): AMF0, chunk stream,
handshake, publish->play relay end-to-end."""

import struct
import threading
import time

import numpy as np

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.net.rtmp import (FLV_HEADER, Rtmp2Sink, Rtmp2Src,
                                    RtmpRelayServer, amf0_decode_all,
                                    amf0_encode, build_flv_tag,
                                    parse_flv_stream)


# ------------------------------------------------------------------- AMF0

def test_amf0_roundtrip():
    vals = ["connect", 1.0, {"app": "live", "ok": True,
                             "nested": {"x": 2.5}}, None]
    blob = b"".join(amf0_encode(v) for v in vals)
    got = amf0_decode_all(blob)
    assert got == vals


# ------------------------------------------------------------------- FLV

def test_flv_tag_roundtrip():
    tag = build_flv_tag(9, 0x1234567, b"\xAA" * 20)
    tags, rest = parse_flv_stream(FLV_HEADER + tag)
    assert rest == b""
    assert tags == [(9, 0x1234567, b"\xAA" * 20)]


def test_flv_partial_stream():
    tag = build_flv_tag(8, 40, b"\x01" * 10)
    tags, rest = parse_flv_stream(tag[:8])
    assert tags == [] and rest == tag[:8]
    tags, rest = parse_flv_stream(rest + tag[8:])
    assert len(tags) == 1 and rest == b""


# --------------------------------------------------------------- end-to-end

def _flv_stream(payloads):
    out = FLV_HEADER
    for k, p in enumerate(payloads):
        out += build_flv_tag(9, k * 40, p)
    return out


def test_publish_play_relay():
    srv = RtmpRelayServer()
    url = f"rtmp://127.0.0.1:{srv.port}/live/cam1"
    try:
        src = Rtmp2Src(location=url, timeout=3.0)
        sink = Rtmp2Sink(location=url)
        src.start()            # player registers first
        sink.start()

        rng = np.random.default_rng(5)
        payloads = [bytes(rng.integers(0, 256, 500 + 37 * k,
                                       np.uint8)) for k in range(6)]
        got = []

        def rx():
            data = b""
            while True:
                buf = src.create(1)
                if buf is None:
                    return
                data += np.asarray(buf.data).tobytes()
                tags, _ = parse_flv_stream(data)
                if len(tags) >= len(payloads):
                    got.extend(tags)
                    return

        th = threading.Thread(target=rx, daemon=True)
        th.start()
        time.sleep(0.1)
        stream = _flv_stream(payloads)
        # push in awkward split sizes to exercise tag reassembly
        for ofs in range(0, len(stream), 700):
            sink.render(Buffer(
                data=np.frombuffer(stream[ofs:ofs + 700], np.uint8),
                batch=1))
        th.join(6.0)
        assert sink.sent_tags == len(payloads)
        assert [t[2] for t in got] == payloads      # byte-exact media
        assert [t[1] for t in got] == [k * 40 for k in
                                       range(len(payloads))]
        src.stop()
        sink.stop()
    finally:
        srv.close()


def test_large_payload_chunking():
    """Payload far beyond the chunk size exercises type-3 chunks."""
    srv = RtmpRelayServer()
    url = f"rtmp://127.0.0.1:{srv.port}/live/big"
    try:
        src = Rtmp2Src(location=url, timeout=3.0)
        sink = Rtmp2Sink(location=url)
        src.start()
        sink.start()
        big = bytes(np.random.default_rng(8).integers(
            0, 256, 40000, np.uint8))
        got = []

        def rx():
            data = b""
            while True:
                buf = src.create(1)
                if buf is None:
                    return
                data += np.asarray(buf.data).tobytes()
                tags, _ = parse_flv_stream(data)
                if tags:
                    got.extend(tags)
                    return

        th = threading.Thread(target=rx, daemon=True)
        th.start()
        time.sleep(0.1)
        sink.render(Buffer(data=np.frombuffer(
            _flv_stream([big]), np.uint8), batch=1))
        th.join(6.0)
        assert got and got[0][2] == big
        src.stop()
        sink.stop()
    finally:
        srv.close()
