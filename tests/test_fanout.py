"""Fan-out sinks + socketsrc + alternate factory names (reference
gst/udp/gstmultiudpsink.c, gst/tcp/gstmultisocketsink.c,
gstsocketsrc.c; alias registrations)."""

import os
import socket

import numpy as np

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.element import element_factory_make as make_element, factory_exists as element_exists
from gstreamer_tpu.core.parse import parse_launch


def _udp_listener():
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    s.settimeout(2.0)
    return s, s.getsockname()[1]


class TestMultiUdpSink:
    def test_fans_out_to_all_clients(self):
        r1, p1 = _udp_listener()
        r2, p2 = _udp_listener()
        p = parse_launch(
            f"appsrc name=in ! application/octet-stream ! "
            f"multiudpsink clients=127.0.0.1:{p1},127.0.0.1:{p2}")
        payload = bytes(range(100))
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(payload, np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        assert r1.recv(2000) == payload
        assert r2.recv(2000) == payload
        r1.close(), r2.close()

    def test_add_remove(self):
        sink = make_element("multiudpsink")
        sink.start()
        sink.add("127.0.0.1", 9000)
        sink.add("127.0.0.1", 9001)
        sink.remove("127.0.0.1", 9000)
        assert sink._clients == [("127.0.0.1", 9001)]
        sink.stop()


class TestDynUdpSink:
    def test_meta_destination(self):
        r, port = _udp_listener()
        p = parse_launch("appsrc name=in ! application/octet-stream ! "
                         "dynudpsink port=1")
        payload = b"dyn-dest"
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(payload, np.uint8), pts=0,
            meta={"host": "127.0.0.1", "port": port}))
        p.get_by_name("in").end_of_stream()
        p.run()
        assert r.recv(2000) == payload
        r.close()


class TestMultiStreamSinks:
    def test_multisocketsink(self):
        a1, b1 = socket.socketpair()
        a2, b2 = socket.socketpair()
        sink = make_element("multisocketsink")
        sink.start()
        sink.add(a1)
        sink.add(a2)
        payload = bytes(range(64))
        sink.render(Buffer(data=np.frombuffer(payload, np.uint8)))
        b1.settimeout(2.0), b2.settimeout(2.0)
        assert b1.recv(200) == payload
        assert b2.recv(200) == payload
        for s in (a1, b1, a2, b2):
            s.close()

    def test_multifdsink_drops_dead_client(self):
        rfd, wfd = os.pipe()
        rfd2, wfd2 = os.pipe()
        sink = make_element("multifdsink")
        sink.start()
        sink.add(wfd)
        sink.add(wfd2)
        os.close(rfd2)                           # make client 2 dead
        payload = b"fd-payload"
        sink.render(Buffer(data=np.frombuffer(payload, np.uint8)))
        assert os.read(rfd, 100) == payload
        assert sink._clients == [wfd]            # dead one dropped
        os.close(rfd), os.close(wfd), os.close(wfd2)


class TestSocketSrc:
    def test_reads_provided_socket(self):
        a, b = socket.socketpair()
        payload = bytes(range(50))
        a.sendall(payload)
        a.shutdown(socket.SHUT_WR)
        p = parse_launch("socketsrc name=src timeout=2 ! "
                         "application/octet-stream ! appsink name=out")
        p.get_by_name("src").props["socket"] = b
        p.run()
        out = bytearray()
        while (s := p.get_by_name("out").pull_sample()) is not None:
            out += bytes(np.asarray(s.buffer.data).ravel())
        assert bytes(out) == payload
        a.close(), b.close()


class TestAliases:
    def test_registered(self):
        for n in ("srtclientsrc", "srtserversrc", "srtclientsink",
                  "srtserversink", "liveadder", "uridecodebin3",
                  "urisourcebin", "encodebin2", "rtmpsink", "rtmpsrc",
                  "hlsdemux2", "dashdemux2", "mssdemux2"):
            assert element_exists(n), n

    def test_srt_mode_fixed(self):
        e = make_element("srtclientsrc")
        assert e.props["mode"] == "caller"
        e = make_element("srtserversink")
        assert e.props["mode"] == "listener"

    def test_liveadder_mixes(self):
        p = parse_launch(
            "audiotestsrc num-buffers=1 samplesperbuffer=64 "
            "volume=0.25 ! audio/x-raw,format=F32LE,rate=8000,"
            "channels=1 ! liveadder name=m ! appsink name=out  "
            "audiotestsrc num-buffers=1 samplesperbuffer=64 "
            "volume=0.25 ! audio/x-raw,format=F32LE,rate=8000,"
            "channels=1 ! m.")
        p.run()
        s = p.get_by_name("out").pull_sample()
        mixed = np.asarray(s.buffer.data).ravel()
        assert np.max(np.abs(mixed)) > 0.3       # 2x 0.25 summed
