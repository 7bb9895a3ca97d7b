"""HTTP/FTP/SMTP client sinks (reference ext/soup/
gstsouphttpclientsink.c, ext/curl/gstcurl*sink.c) against real
in-process protocol servers."""

import socket
import threading

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch

PAYLOAD = bytes(range(256)) * 8


def _push_through(sink_desc, extra=None):
    p = parse_launch(f"appsrc name=in ! application/octet-stream ! "
                     f"{sink_desc}")
    if extra:
        extra(p)
    p.get_by_name("in").push_buffer(Buffer(
        data=np.frombuffer(PAYLOAD, np.uint8), pts=0))
    p.get_by_name("in").end_of_stream()
    p.run()
    return p


class TestHttpPut:
    def _server(self, store):
        from http.server import BaseHTTPRequestHandler, HTTPServer

        class H(BaseHTTPRequestHandler):
            def do_PUT(self):
                ln = int(self.headers["Content-Length"])
                store["path"] = self.path
                store["body"] = self.rfile.read(ln)
                store["auth"] = self.headers.get("Authorization")
                self.send_response(200)
                self.end_headers()

            def log_message(self, *a):
                pass

        srv = HTTPServer(("127.0.0.1", 0), H)
        threading.Thread(target=srv.handle_request,
                         daemon=True).start()
        return srv, srv.server_address[1]

    @pytest.mark.parametrize("factory", ["souphttpclientsink",
                                         "curlhttpsink"])
    def test_put_uploads_stream(self, factory):
        store = {}
        srv, port = self._server(store)
        _push_through(f"{factory} "
                      f"location=http://127.0.0.1:{port}/up.bin")
        srv.server_close()
        assert store["body"] == PAYLOAD
        assert store["path"] == "/up.bin"

    def test_basic_auth_header(self):
        store = {}
        srv, port = self._server(store)
        _push_through(f"souphttpclientsink user-id=me user-pw=pw "
                      f"location=http://127.0.0.1:{port}/a")
        srv.server_close()
        assert store["auth"].startswith("Basic ")


class TestCurlFileSink:
    def test_writes_file(self, tmp_path):
        dst = tmp_path / "out.bin"
        _push_through(f"curlfilesink location=file://{dst}")
        assert dst.read_bytes() == PAYLOAD


class _MiniFtp(threading.Thread):
    """Just enough FTP for one STOR: greeting, USER/PASS/TYPE, PASV,
    STOR."""

    def __init__(self):
        super().__init__(daemon=True)
        self.ctrl = socket.socket()
        self.ctrl.bind(("127.0.0.1", 0))
        self.ctrl.listen(1)
        self.port = self.ctrl.getsockname()[1]
        self.stored = {}

    def run(self):
        c, _ = self.ctrl.accept()
        f = c.makefile("rwb")

        def send(line):
            f.write(line.encode() + b"\r\n")
            f.flush()

        send("220 mini ftp")
        data_srv = socket.socket()
        data_srv.bind(("127.0.0.1", 0))
        data_srv.listen(1)
        dport = data_srv.getsockname()[1]
        while True:
            line = f.readline().decode().strip()
            if not line:
                break
            cmd = line.split()[0].upper()
            if cmd == "USER":
                send("331 pw required")
            elif cmd == "PASS":
                send("230 ok")
            elif cmd == "TYPE":
                send("200 ok")
            elif cmd == "PASV":
                send("227 Entering Passive Mode (127,0,0,1,%d,%d)"
                     % (dport >> 8, dport & 0xFF))
            elif cmd == "STOR":
                send("150 go ahead")
                d, _ = data_srv.accept()
                chunks = []
                while True:
                    b = d.recv(65536)
                    if not b:
                        break
                    chunks.append(b)
                d.close()
                self.stored[line.split(None, 1)[1]] = b"".join(chunks)
                send("226 done")
            elif cmd == "QUIT":
                send("221 bye")
                break
            else:
                send("200 ok")
        c.close()


class TestCurlFtpSink:
    def test_stor_uploads(self):
        srv = _MiniFtp()
        srv.start()
        _push_through(f"curlftpsink user=u passwd=p "
                      f"location=ftp://127.0.0.1:{srv.port}/up.dat")
        srv.join(timeout=10)
        assert srv.stored.get("up.dat") == PAYLOAD


class _MiniSmtp(threading.Thread):
    """Just enough SMTP for one message."""

    def __init__(self):
        super().__init__(daemon=True)
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.message = b""

    def run(self):
        c, _ = self.sock.accept()
        f = c.makefile("rwb")

        def send(line):
            f.write(line.encode() + b"\r\n")
            f.flush()

        send("220 mini smtp")
        in_data = False
        body = []
        while True:
            line = f.readline()
            if not line:
                break
            if in_data:
                if line.strip() == b".":
                    in_data = False
                    self.message = b"".join(body)
                    send("250 queued")
                else:
                    body.append(line)
                continue
            cmd = line.decode().strip().upper()
            if cmd.startswith(("EHLO", "HELO")):
                send("250 mini")
            elif cmd.startswith(("MAIL", "RCPT")):
                send("250 ok")
            elif cmd.startswith("DATA"):
                send("354 go")
                in_data = True
            elif cmd.startswith("QUIT"):
                send("221 bye")
                break
            else:
                send("250 ok")
        c.close()


class TestCurlSmtpSink:
    def test_mails_attachment(self):
        srv = _MiniSmtp()
        srv.start()
        _push_through(
            f"curlsmtpsink mail-from=a@b.c mail-rcpt=d@e.f "
            f"location=smtp://127.0.0.1:{srv.port}")
        srv.join(timeout=10)
        assert b"Subject: media stream" in srv.message
        import base64
        # attachment payload present (base64-encoded body)
        assert base64.b64encode(PAYLOAD[:57]) in srv.message.replace(
            b"\r\n", b"\n").replace(b"\n", b"")


class TestCurlHttpSrc:
    def test_registered_over_souphttpsrc(self):
        from gstreamer_tpu.core.element import (
            element_factory_make, factory_exists)
        from gstreamer_tpu.elements.ipc_misc import SoupHttpSrc
        assert factory_exists("curlhttpsrc")
        assert isinstance(element_factory_make("curlhttpsrc"),
                          SoupHttpSrc)
