"""proxy/shm bridges, souphttpsrc, tsparse, streamsynchronizer,
unaligned raw parsers (gst-plugins-bad/gst/proxy, sys/shm,
ext/soup, gst/mpegtsdemux, gst/rawparse)."""

import threading

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch


class TestProxy:
    def test_bridge_two_pipelines(self):
        p1 = parse_launch(
            "audiotestsrc num-buffers=3 samplesperbuffer=400 wave=saw "
            "! audio/x-raw,format=F32LE,rate=8000,channels=1 ! "
            "proxysink channel=t1")
        p1.run()
        p1.set_state("null")
        p2 = parse_launch("proxysrc channel=t1 ! appsink name=out")
        p2.run()
        got = []
        caps = None
        while (s := p2.get_by_name("out").pull_sample()) is not None:
            caps = s.caps
            got.append(np.asarray(s.buffer.data))
        total = sum(g.shape[0] for g in got)
        assert total == 1200
        assert caps[0].name == "audio/x-raw"     # caps traveled over

        gold = parse_launch(
            "audiotestsrc num-buffers=3 samplesperbuffer=400 wave=saw "
            "! audio/x-raw,format=F32LE,rate=8000,channels=1 ! "
            "appsink name=out")
        gold.run()
        want = np.concatenate(
            [np.asarray(s.buffer.data) for s in
             iter(lambda: gold.get_by_name("out").pull_sample(), None)])
        np.testing.assert_array_equal(np.concatenate(got), want)


class TestShm:
    def test_jpeg_over_shm(self, tmp_path):
        path = tmp_path / "shm"
        p = parse_launch(
            f"videotestsrc num-buffers=3 ! video/x-raw,format=I420,"
            f"width=32,height=24 ! jpegenc ! shmsink "
            f"socket-path={path}")
        p.run()
        p.set_state("null")
        d = parse_launch(f"shmsrc socket-path={path} ! appsink "
                         f"name=out")
        d.run()
        n = 0
        while (s := d.get_by_name("out").pull_sample()) is not None:
            raw = np.asarray(s.buffer.data).tobytes()
            assert raw.startswith(b"\xff\xd8")
            n += 1
        assert n == 3

    def test_length_prefix_framing(self, tmp_path):
        path = tmp_path / "shm2"
        p = parse_launch(f"appsrc name=in ! application/octet-stream "
                         f"! shmsink socket-path={path}")
        for blob in (b"abc", b"de", b"f" * 1000):
            p.get_by_name("in").push_buffer(Buffer(
                data=np.frombuffer(blob, np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        p.set_state("null")
        d = parse_launch(f"shmsrc socket-path={path} ! appsink "
                         f"name=out")
        d.run()
        got = []
        while (s := d.get_by_name("out").pull_sample()) is not None:
            got.append(np.asarray(s.buffer.data).tobytes())
        assert got == [b"abc", b"de", b"f" * 1000]


class TestSoupHttpSrc:
    def test_localhost_fetch(self, tmp_path):
        import http.server
        import socketserver
        (tmp_path / "data.bin").write_bytes(b"HELLO-SOUP" * 100)

        class H(http.server.SimpleHTTPRequestHandler):
            def __init__(self, *a, **kw):
                super().__init__(*a, directory=str(tmp_path), **kw)

            def log_message(self, *a):
                pass

        with socketserver.TCPServer(("127.0.0.1", 0), H) as httpd:
            port = httpd.server_address[1]
            t = threading.Thread(target=httpd.serve_forever,
                                 daemon=True)
            t.start()
            try:
                p = parse_launch(
                    f"souphttpsrc "
                    f"location=http://127.0.0.1:{port}/data.bin "
                    f"blocksize=256 ! appsink name=out")
                p.run()
                got = b""
                while (s := p.get_by_name("out")
                        .pull_sample()) is not None:
                    got += np.asarray(s.buffer.data).tobytes()
            finally:
                httpd.shutdown()
        assert got == b"HELLO-SOUP" * 100


class TestTsParse:
    def test_packet_alignment(self, tmp_path):
        path = tmp_path / "a.ts"
        p = parse_launch(
            f"appsrc name=in ! application/octet-stream ! "
            f"mpegtsmux location={path}")
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(bytes(range(256)) * 40, np.uint8),
            pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        p.set_state("null")
        blob = open(path, "rb").read()
        # prepend garbage to force a resync
        d = parse_launch("appsrc name=in ! video/mpegts ! tsparse ! "
                         "appsink name=out")
        d.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(b"xx" + blob, np.uint8), pts=0))
        d.get_by_name("in").end_of_stream()
        d.run()
        pkts = 0
        while (s := d.get_by_name("out").pull_sample()) is not None:
            arr = np.asarray(s.buffer.data)
            if arr.ndim > 1:
                assert arr.shape[1] == 188
                assert all(arr[:, 0] == 0x47)
                pkts += arr.shape[0]
            else:
                assert arr.shape[0] == 188 and arr[0] == 0x47
                pkts += 1
        assert pkts == len(blob) // 188


class TestMiscPassthrough:
    def test_streamsynchronizer_passthrough(self):
        p = parse_launch(
            "videotestsrc num-buffers=2 ! video/x-raw,format=RGB,"
            "width=16,height=16 ! streamsynchronizer ! appsink "
            "name=out")
        p.run()
        assert p.get_by_name("out").pull_sample() is not None

    def test_unaligned_parsers(self):
        p = parse_launch(
            "appsrc name=in ! application/octet-stream ! "
            "unalignedvideoparse width=8 height=8 format=GRAY8 ! "
            "appsink name=out")
        # push two frames in three odd-sized chunks
        data = bytes(range(64)) + bytes(range(64, 128))
        for chunk in (data[:50], data[50:90], data[90:]):
            p.get_by_name("in").push_buffer(Buffer(
                data=np.frombuffer(chunk, np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        frames = 0
        while (s := p.get_by_name("out").pull_sample()) is not None:
            frames += s.buffer.batch or 1
        assert frames == 2
