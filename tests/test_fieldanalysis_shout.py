"""fieldanalysis (gstfieldanalysis.c) and shout2send (gstshout2.c)."""

import base64
import socket
import threading

import numpy as np

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.caps import Caps
from gstreamer_tpu.core.element import element_factory_make


class TestFieldAnalysis:
    def _frames(self, interlaced):
        rng = np.random.default_rng(0)
        a = rng.integers(0, 256, (64, 64)).astype(np.uint8)
        a = np.repeat(np.repeat(a[::4, ::4], 4, 0), 4, 1)  # smooth
        if not interlaced:
            return a[None]
        b = np.roll(a, 8, axis=1)          # shifted second field
        woven = a.copy()
        woven[1::2] = b[1::2]
        return woven[None]

    def test_progressive_detected(self):
        fa = element_factory_make("fieldanalysis")
        out = fa.host_process(Buffer(data=(self._frames(False),),
                                     batch=1))
        assert out.meta["interlace-mode"] == "progressive"
        assert fa.n_progressive == 1

    def test_interlaced_detected(self):
        fa = element_factory_make("fieldanalysis")
        out = fa.host_process(Buffer(data=(self._frames(True),),
                                     batch=1))
        assert out.meta["interlace-mode"] == "interleaved"
        assert fa.n_interlaced == 1


class _FakeIcecast:
    """Accepts one source connection, checks auth, stores payload."""

    def __init__(self, password="hackme"):
        self.password = password
        self.srv = socket.socket()
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", 0))
        self.port = self.srv.getsockname()[1]
        self.srv.listen(1)
        self.headers = b""
        self.payload = b""
        self.ok = None
        self._th = threading.Thread(target=self._serve, daemon=True)
        self._th.start()

    def _serve(self):
        conn, _ = self.srv.accept()
        conn.settimeout(5.0)
        data = b""
        while b"\r\n\r\n" not in data:
            data += conn.recv(4096)
        self.headers, _, rest = data.partition(b"\r\n\r\n")
        want = base64.b64encode(f"source:{self.password}".encode())
        if b"Authorization: Basic " + want in self.headers:
            conn.sendall(b"HTTP/1.1 100 Continue\r\n\r\n")
            self.ok = True
        else:
            conn.sendall(b"HTTP/1.1 401 Unauthorized\r\n\r\n")
            self.ok = False
            conn.close()
            return
        self.payload += rest
        try:
            while True:
                part = conn.recv(4096)
                if not part:
                    break
                self.payload += part
        except OSError:
            pass

    def close(self):
        self.srv.close()
        self._th.join(2.0)


class TestShout2Send:
    def test_stream_with_auth(self):
        srv = _FakeIcecast()
        s = element_factory_make("shout2send", ip="127.0.0.1",
                                 port=srv.port, mount="/radio.ogg",
                                 password="hackme",
                                 streamname="test radio")
        s.set_info(Caps.from_string("application/ogg"), None)
        s.start()
        blob = bytes(range(256)) * 8
        s.render(Buffer(data=np.frombuffer(blob, np.uint8), batch=1))
        s.stop()
        srv.close()
        assert srv.ok is True
        assert b"PUT /radio.ogg HTTP/1.1" in srv.headers
        assert b"ice-name: test radio" in srv.headers
        assert b"Content-Type: application/ogg" in srv.headers
        assert srv.payload == blob
        assert s.bytes_sent == len(blob)

    def test_wrong_password_rejected(self):
        import pytest
        srv = _FakeIcecast(password="correct")
        s = element_factory_make("shout2send", ip="127.0.0.1",
                                 port=srv.port, password="wrong")
        s.set_info(Caps.from_string("application/ogg"), None)
        with pytest.raises(ConnectionError):
            s.start()
        srv.close()
        assert srv.ok is False
