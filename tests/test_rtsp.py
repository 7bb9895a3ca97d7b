"""RTSP protocol lib + server + rtspsrc end-to-end over localhost.

Mirrors the reference's rtsp-server tests (subprojects/gst-rtsp-server/
tests/check/gst/rtspserver.c) at a reduced scale: message round-trips,
method dispatch, and a full DESCRIBE/SETUP/PLAY session pulling real RTP
video off the wire."""

import socket
import time

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.net.rtsp import (RTSPMessage, RTSPTransport, RTSPUrl,
                                    parse_message)
from gstreamer_tpu.net.rtsp_server import RTSPMediaFactory, RTSPServer
from gstreamer_tpu.net.sdp import SDPMessage


class TestMessages:
    def test_request_roundtrip(self):
        req = RTSPMessage.request("DESCRIBE", "rtsp://h/test")
        req.headers.set("CSeq", "3")
        req.headers.set("Accept", "application/sdp")
        msg, used = parse_message(req.serialize())
        assert used == len(req.serialize())
        assert msg.kind == "request" and msg.method == "DESCRIBE"
        assert msg.headers.get("cseq") == "3"     # case-insensitive

    def test_response_with_body(self):
        r = RTSPMessage.response(200)
        r.body = b"v=0\r\n"
        data = r.serialize()
        msg, used = parse_message(data + b"extra")
        assert used == len(data)
        assert msg.status == 200 and msg.body == b"v=0\r\n"

    def test_partial_returns_none(self):
        assert parse_message(b"OPTIONS rtsp://h RTSP/1.0\r\nCSeq")[0] is None

    def test_transport(self):
        t = RTSPTransport.parse(
            "RTP/AVP;unicast;client_port=5000-5001;ssrc=DEADBEEF")
        assert t.client_port == (5000, 5001)
        assert t.ssrc == 0xDEADBEEF
        assert "client_port=5000-5001" in t.to_string()

    def test_url(self):
        u = RTSPUrl.parse("rtsp://127.0.0.1:8554/test")
        assert (u.host, u.port, u.abspath) == ("127.0.0.1", 8554, "/test")


@pytest.fixture
def server():
    srv = RTSPServer(service=0)
    srv.mount_points.add_factory(
        "/test", RTSPMediaFactory(
            "( videotestsrc num-buffers=4 pattern=gradient ! "
            "video/x-raw,format=RGB,width=48,height=32,framerate=30/1 ! "
            "rtpvrawpay name=pay0 pt=96 )", rate_control=False))
    port = srv.attach()
    yield srv, port
    srv.shutdown()


def _raw_call(sock, msg):
    sock.sendall(msg.serialize())
    data = b""
    while True:
        data += sock.recv(65536)
        m, _ = parse_message(data)
        if m is not None:
            return m


class TestServer:
    def test_options_describe(self, server):
        srv, port = server
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        req = RTSPMessage.request("OPTIONS", f"rtsp://127.0.0.1:{port}/test")
        req.headers.set("CSeq", "1")
        resp = _raw_call(s, req)
        assert resp.status == 200
        assert "DESCRIBE" in resp.headers.get("Public")
        req = RTSPMessage.request("DESCRIBE",
                                  f"rtsp://127.0.0.1:{port}/test")
        req.headers.set("CSeq", "2")
        resp = _raw_call(s, req)
        assert resp.status == 200
        sdp = SDPMessage.parse(resp.body.decode())
        m = sdp.medias[0]
        assert m.media == "video"
        assert m.rtpmaps()[96][0] == "RAW"
        assert "width=48" in (m.get_attribute_val("fmtp") or "")
        s.close()

    def test_describe_unknown_404(self, server):
        srv, port = server
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        req = RTSPMessage.request("DESCRIBE",
                                  f"rtsp://127.0.0.1:{port}/nope")
        req.headers.set("CSeq", "1")
        assert _raw_call(s, req).status == 404
        s.close()

    def test_setup_requires_transport(self, server):
        srv, port = server
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        req = RTSPMessage.request("SETUP",
                                  f"rtsp://127.0.0.1:{port}/test/stream=0")
        req.headers.set("CSeq", "1")
        assert _raw_call(s, req).status == 461
        s.close()


class TestEndToEnd:
    def test_rtspsrc_receives_video(self, server):
        srv, port = server
        p = parse_launch(
            f"rtspsrc location=rtsp://127.0.0.1:{port}/test timeout=1.0 "
            "eos-timeouts=3 ! rtpvrawdepay ! appsink name=out")
        p.run()
        sink = p.get_by_name("out")
        frames = []
        while True:
            s = sink.pull_sample()
            if s is None:
                break
            d = [np.asarray(x) for x in s.buffer.data]
            for k in range(d[0].shape[0]):
                frames.append(tuple(x[k] for x in d))
        assert len(frames) >= 2
        r, g, b = frames[0]
        assert r.shape == (32, 48)
        # gradient pattern: rows must not be constant across the frame
        assert r.std() > 0


class TestRtcp:
    def test_server_sends_sr_client_reports_rr(self, server):
        """rtsp-stream.c RTCP path: SRs arrive on the client's RTCP
        socket, RRs arrive back on the server's (localhost e2e)."""
        srv, port = server
        p = parse_launch(
            f"rtspsrc name=src location=rtsp://127.0.0.1:{port}/test "
            "timeout=1.0 eos-timeouts=3 ! rtpvrawdepay ! "
            "appsink name=out")
        p.run()
        src = p.get_by_name("src")
        assert src.last_sr is not None, "no server SR received"
        assert src.last_sr.packet_count > 0
        assert src.last_sr.ntp > 0
        assert src.rr_sent >= 1
        # client-side receive statistics were kept per SSRC
        assert src._sources
        st = next(iter(src._sources.values()))
        assert st.packets > 0 and st.lost == 0
        p.set_state("null")

    def test_setup_reports_rtcp_server_port(self, server):
        srv, port = server
        import socket as socket_mod
        s = socket_mod.create_connection(("127.0.0.1", port), timeout=5)
        req = RTSPMessage.request(
            "SETUP", f"rtsp://127.0.0.1:{port}/test/stream=0")
        req.headers.set("CSeq", "1")
        req.headers.set("Transport",
                        "RTP/AVP;unicast;client_port=40000-40001")
        resp = _raw_call(s, req)
        assert resp.status == 200
        from gstreamer_tpu.net.rtsp import RTSPTransport
        t = RTSPTransport.parse(resp.headers.get("Transport"))
        assert t.server_port[0] != 0 and t.server_port[1] != 0
        assert t.server_port[0] != t.server_port[1]
        assert t.ssrc is not None
        s.close()


class TestTcpInterleaved:
    def test_rtspsrc_tcp_transport(self, server):
        """RTP/AVP/TCP: media flows as interleaved $-framed channels
        on the RTSP connection (rtsp-stream.c TCP transport;
        rtspsrc protocols property)."""
        srv, port = server
        p = parse_launch(
            f"rtspsrc name=src location=rtsp://127.0.0.1:{port}/test "
            "protocols=tcp timeout=1.0 eos-timeouts=3 ! "
            "rtpvrawdepay ! appsink name=out")
        p.run()
        sink = p.get_by_name("out")
        frames = []
        while True:
            s = sink.pull_sample()
            if s is None:
                break
            d = [np.asarray(x) for x in s.buffer.data]
            for k in range(d[0].shape[0]):
                frames.append(tuple(x[k] for x in d))
        assert len(frames) >= 2
        assert frames[0][0].shape == (32, 48)
        src = p.get_by_name("src")
        # SRs ride interleaved channel 1
        assert src.last_sr is not None
        p.set_state("null")
