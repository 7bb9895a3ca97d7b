"""RTSP server authentication, RECORD mode, and multicast.

Mirrors the reference's rtsp-server auth/record tests
(subprojects/gst-rtsp-server/tests/check/gst/rtspserver.c,
rtsp-auth.c, rtsp-media.c RECORD mode, rtsp-address-pool.c):
an unauthenticated request past OPTIONS gets 401 + WWW-Authenticate,
credentials (Basic and Digest, RFC 7616) unlock it; a client can
ANNOUNCE/SETUP(mode=RECORD)/RECORD and the pushed frames land in a
file; multicast SETUP allocates a group/port/ttl from the pool."""

import socket

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.net.rtsp import RTSPMessage, RTSPTransport, RTSPUrl, \
    parse_message
from gstreamer_tpu.net.rtsp_auth import (RTSPAuth, build_authorization,
                                         digest_response)
from gstreamer_tpu.net.rtsp_server import (RTSPAddressPool,
                                           RTSPMediaFactory, RTSPServer)

LAUNCH = ("( videotestsrc num-buffers=4 pattern=gradient ! "
          "video/x-raw,format=RGB,width=48,height=32,framerate=30/1 ! "
          "rtpvrawpay name=pay0 pt=96 )")


def _raw_call(sock, msg):
    sock.sendall(msg.serialize())
    data = b""
    while True:
        data += sock.recv(65536)
        m, _ = parse_message(data)
        if m is not None:
            return m


def _req(method, uri, cseq="1", **headers):
    req = RTSPMessage.request(method, uri)
    req.headers.set("CSeq", cseq)
    for k, v in headers.items():
        req.headers.set(k.replace("_", "-"), v)
    return req


# ---------------------------------------------------------------------------
# auth unit behavior (rtsp-auth.c)
# ---------------------------------------------------------------------------

class TestAuthUnit:
    def test_digest_rfc7616_roundtrip(self):
        # client answer to our own challenge must validate
        auth = RTSPAuth(realm="r", methods=("digest",))
        auth.add_user("mufasa", "Circle of Life")
        (_, chal), = auth.challenge_headers()
        hdr = build_authorization(chal, "mufasa", "Circle of Life",
                                  "DESCRIBE", "rtsp://h/test")
        assert auth.check(hdr, "DESCRIBE", "rtsp://h/test", "/test") \
            == "mufasa"

    def test_digest_wrong_password(self):
        auth = RTSPAuth(realm="r", methods=("digest",))
        auth.add_user("u", "right")
        (_, chal), = auth.challenge_headers()
        hdr = build_authorization(chal, "u", "wrong", "DESCRIBE",
                                  "rtsp://h/t")
        assert auth.check(hdr, "DESCRIBE", "rtsp://h/t", "/t") is None

    def test_digest_stale_nonce(self):
        auth = RTSPAuth(realm="r", methods=("digest",))
        auth.add_user("u", "p")
        (_, chal), = auth.challenge_headers()
        hdr = build_authorization(chal, "u", "p", "SETUP", "rtsp://h/t")
        nonce = next(iter(auth._nonces))
        auth._nonces[nonce] -= 1000           # age it past the lifetime
        assert auth.check(hdr, "SETUP", "rtsp://h/t", "/t") is None

    def test_basic(self):
        auth = RTSPAuth(methods=("basic",))
        auth.add_user("user", "pw")
        assert auth.check("Basic dXNlcjpwdw==", "DESCRIBE",
                          "rtsp://h/t", "/t") == "user"
        assert auth.check("Basic dXNlcjpXUk9ORw==", "DESCRIBE",
                          "rtsp://h/t", "/t") is None

    def test_per_path_permissions(self):
        # rtsp-permissions.c: a user may be allowed on some mounts only
        auth = RTSPAuth(methods=("basic",))
        auth.add_user("user", "pw", paths={"/allowed"})
        hdr = build_authorization('Basic realm="r"', "user", "pw",
                                  "DESCRIBE", "u")
        assert auth.check(hdr, "DESCRIBE", "u", "/allowed") == "user"
        assert auth.check(hdr, "DESCRIBE", "u", "/secret") is None

    def test_digest_response_known_vector(self):
        # RFC 2617 §3.5 example (no qop form)
        r = digest_response(
            "Mufasa", "testrealm@host.com", "Circle Of Life", "GET",
            "/dir/index.html", "dcd98b7102dd2f0e8b11d0f600bfb0c093")
        assert r == "670fd8c2df070c60b045671b8b24ff02"


# ---------------------------------------------------------------------------
# authenticated server (rtsp-client.c + rtsp-auth.c)
# ---------------------------------------------------------------------------

@pytest.fixture
def auth_server():
    auth = RTSPAuth(realm="gtpu-test")
    auth.add_user("user", "pw")
    srv = RTSPServer(service=0, auth=auth)
    srv.mount_points.add_factory(
        "/test", RTSPMediaFactory(LAUNCH, rate_control=False))
    port = srv.attach()
    yield srv, port
    srv.shutdown()


class TestAuthServer:
    def test_describe_needs_credentials(self, auth_server):
        srv, port = auth_server
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        uri = f"rtsp://127.0.0.1:{port}/test"
        # OPTIONS stays open (gst_rtsp_auth_check allows it)
        assert _raw_call(s, _req("OPTIONS", uri)).status == 200
        resp = _raw_call(s, _req("DESCRIBE", uri, cseq="2"))
        assert resp.status == 401
        chals = [v for k, v in resp.headers.items()
                 if k.lower() == "www-authenticate"]
        schemes = {c.split(" ")[0].lower() for c in chals}
        assert schemes == {"digest", "basic"}
        # answer the Digest challenge -> 200
        chal = next(c for c in chals if c.lower().startswith("digest"))
        hdr = build_authorization(chal, "user", "pw", "DESCRIBE", uri)
        resp = _raw_call(s, _req("DESCRIBE", uri, cseq="3",
                                 Authorization=hdr))
        assert resp.status == 200 and b"m=video" in resp.body
        s.close()

    def test_basic_over_the_wire(self, auth_server):
        srv, port = auth_server
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        uri = f"rtsp://127.0.0.1:{port}/test"
        hdr = build_authorization('Basic realm="gtpu-test"',
                                  "user", "pw", "DESCRIBE", uri)
        assert _raw_call(s, _req("DESCRIBE", uri,
                                 Authorization=hdr)).status == 200
        bad = build_authorization('Basic realm="gtpu-test"',
                                  "user", "nope", "DESCRIBE", uri)
        assert _raw_call(s, _req("DESCRIBE", uri, cseq="2",
                                 Authorization=bad)).status == 401
        s.close()

    def test_rtspsrc_auth_retry_e2e(self, auth_server):
        """gstrtspsrc.c gst_rtspsrc_setup_auth: first request draws a
        401, the element answers the challenge and media flows."""
        srv, port = auth_server
        p = parse_launch(
            f"rtspsrc location=rtsp://127.0.0.1:{port}/test "
            "user-id=user user-pw=pw timeout=0.5 eos-timeouts=3 ! "
            "rtpvrawdepay ! appsink name=out")
        p.run()
        sink = p.get_by_name("out")
        frames = 0
        while True:
            smp = sink.pull_sample()
            if smp is None:
                break
            frames += np.asarray(smp.buffer.data[0]).shape[0]
        assert frames >= 2

    def test_url_credentials_form(self, auth_server):
        # rtsp://user:pw@host/path carries the credentials (gstrtspsrc
        # location userinfo parsing)
        srv, port = auth_server
        u = RTSPUrl.parse(f"rtsp://user:pw@127.0.0.1:{port}/test")
        assert (u.user, u.password) == ("user", "pw")
        p = parse_launch(
            f"rtspsrc location=rtsp://user:pw@127.0.0.1:{port}/test "
            "timeout=0.5 eos-timeouts=3 ! rtpvrawdepay ! "
            "appsink name=out")
        p.run()
        sink = p.get_by_name("out")
        assert sink.pull_sample() is not None

    def test_wrong_password_fails(self, auth_server):
        srv, port = auth_server
        p = parse_launch(
            f"rtspsrc location=rtsp://127.0.0.1:{port}/test "
            "user-id=user user-pw=WRONG timeout=0.5 ! rtpvrawdepay ! "
            "appsink name=out")
        with pytest.raises(ConnectionError):
            p.run()


# ---------------------------------------------------------------------------
# RECORD (rtsp-media.c RECORD mode + rtspclientsink)
# ---------------------------------------------------------------------------

@pytest.fixture
def record_server(tmp_path):
    out = tmp_path / "recorded.rgb"
    srv = RTSPServer(service=0)
    srv.mount_points.add_factory(
        "/publish", RTSPMediaFactory(
            "( appsrc name=depay0 caps=application/x-rtp ! "
            'rtpvrawdepay caps="video/x-raw,format=RGB,width=48,'
            'height=32" ! '
            f"filesink location={out} )",
            transport_mode="record"))
    port = srv.attach()
    yield srv, port, out
    srv.shutdown()


class TestRecord:
    N_FRAMES = 4
    FRAME_BYTES = 48 * 32 * 3

    def _publish(self, port, protocols):
        p = parse_launch(
            "videotestsrc num-buffers=4 pattern=gradient ! "
            "video/x-raw,format=RGB,width=48,height=32,framerate=30/1 ! "
            "rtpvrawpay pt=96 ! rtspclientsink name=snk "
            f"location=rtsp://127.0.0.1:{port}/publish "
            f"protocols={protocols}")
        p.run()
        return p

    def test_record_udp_lands_frames_in_file(self, record_server):
        srv, port, out = record_server
        p = self._publish(port, "udp")
        assert p.get_by_name("snk").packets_sent > 0
        data = out.read_bytes()
        assert len(data) == self.N_FRAMES * self.FRAME_BYTES
        # gradient frames: content is real, not zero-fill
        arr = np.frombuffer(data, np.uint8)
        assert arr.std() > 0

    def test_record_tcp_interleaved(self, record_server):
        srv, port, out = record_server
        self._publish(port, "tcp")
        data = out.read_bytes()
        assert len(data) == self.N_FRAMES * self.FRAME_BYTES

    def test_play_setup_on_record_mount_rejected(self, record_server):
        # mode must match the factory transport mode (rtsp-media.c
        # gst_rtsp_media_complete_pipeline)
        srv, port, _ = record_server
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        resp = _raw_call(s, _req(
            "SETUP", f"rtsp://127.0.0.1:{port}/publish/stream=0",
            Transport="RTP/AVP;unicast;client_port=40000-40001"))
        assert resp.status == 461
        s.close()

    def test_announce_on_play_mount_rejected(self):
        srv = RTSPServer(service=0)
        srv.mount_points.add_factory(
            "/test", RTSPMediaFactory(LAUNCH, rate_control=False))
        port = srv.attach()
        try:
            s = socket.create_connection(("127.0.0.1", port), timeout=5)
            req = _req("ANNOUNCE", f"rtsp://127.0.0.1:{port}/test",
                       Content_Type="application/sdp")
            req.body = b"v=0\r\no=- 0 0 IN IP4 0.0.0.0\r\ns=x\r\nt=0 0\r\n"
            assert _raw_call(s, req).status == 405
            s.close()
        finally:
            srv.shutdown()


# ---------------------------------------------------------------------------
# multicast (rtsp-address-pool.c + rtsp-stream.c mcast path)
# ---------------------------------------------------------------------------

class TestMulticast:
    def test_pool_allocation_and_release(self):
        pool = RTSPAddressPool(min_port=5000, max_port=5006, ttl=2)
        a = pool.acquire()
        b = pool.acquire()
        assert a[0].startswith("239.255.42.")
        assert a[1] % 2 == 0 and a[2] == a[1] + 1
        assert b[1] == a[1] + 2
        pool.release(a)
        assert pool.acquire() == a          # reuse after release
        pool.acquire()
        with pytest.raises(RuntimeError):
            pool.acquire()                  # exhausted

    def test_setup_multicast_allocates_group(self):
        srv = RTSPServer(service=0, address_pool=RTSPAddressPool(ttl=3))
        srv.mount_points.add_factory(
            "/test", RTSPMediaFactory(LAUNCH, rate_control=False))
        port = srv.attach()
        try:
            s = socket.create_connection(("127.0.0.1", port), timeout=5)
            resp = _raw_call(s, _req(
                "SETUP", f"rtsp://127.0.0.1:{port}/test/stream=0",
                Transport="RTP/AVP;multicast"))
            assert resp.status == 200
            t = RTSPTransport.parse(resp.headers.get("Transport"))
            assert not t.unicast
            assert (t.destination or "").startswith("239.255.42.")
            assert t.port[0] > 0 and t.port[1] == t.port[0] + 1
            assert t.ttl == 3
            s.close()
        finally:
            srv.shutdown()

    def test_setup_multicast_without_pool_rejected(self):
        srv = RTSPServer(service=0)                 # no address pool
        srv.mount_points.add_factory(
            "/test", RTSPMediaFactory(LAUNCH, rate_control=False))
        port = srv.attach()
        try:
            s = socket.create_connection(("127.0.0.1", port), timeout=5)
            resp = _raw_call(s, _req(
                "SETUP", f"rtsp://127.0.0.1:{port}/test/stream=0",
                Transport="RTP/AVP;multicast"))
            assert resp.status == 461
            s.close()
        finally:
            srv.shutdown()

    def test_rtspsrc_udp_mcast_e2e(self):
        """rtspsrc protocols=udp-mcast joins the announced group and
        receives media (gstrtspsrc multicast udpsrc setup)."""
        if not _mcast_loopback_works():
            pytest.skip("multicast loopback unavailable on this host")
        srv = RTSPServer(service=0, address_pool=RTSPAddressPool())
        srv.mount_points.add_factory(
            "/test", RTSPMediaFactory(LAUNCH, rate_control=False))
        port = srv.attach()
        try:
            p = parse_launch(
                f"rtspsrc location=rtsp://127.0.0.1:{port}/test "
                "protocols=udp-mcast timeout=0.5 eos-timeouts=4 ! "
                "rtpvrawdepay ! appsink name=out")
            p.run()
            sink = p.get_by_name("out")
            frames = 0
            while True:
                smp = sink.pull_sample()
                if smp is None:
                    break
                frames += np.asarray(smp.buffer.data[0]).shape[0]
            assert frames >= 2
        finally:
            srv.shutdown()


def _mcast_loopback_works() -> bool:
    """Probe whether this host loops multicast back to a local
    listener (containers often lack it)."""
    group, port = "239.255.43.43", 54545
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        rx.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        rx.bind(("", port))
        rx.setsockopt(socket.IPPROTO_IP, socket.IP_ADD_MEMBERSHIP,
                      socket.inet_aton(group) + socket.inet_aton("0.0.0.0"))
        rx.settimeout(0.5)
        tx.setsockopt(socket.IPPROTO_IP, socket.IP_MULTICAST_LOOP, 1)
        tx.sendto(b"ping", (group, port))
        return rx.recv(16) == b"ping"
    except OSError:
        return False
    finally:
        rx.close()
        tx.close()
