"""rfbsrc against an in-process minimal RFB 3.8 server."""

import socket
import struct
import threading

import numpy as np

from gstreamer_tpu.core.element import element_factory_make


class MiniVnc(threading.Thread):
    """Serves one client: 16x8 framebuffer, first update draws a red
    left half via Raw, second update copies it right via CopyRect."""

    def __init__(self):
        super().__init__(daemon=True)
        self.sk = socket.socket()
        self.sk.bind(("127.0.0.1", 0))
        self.sk.listen(1)
        self.port = self.sk.getsockname()[1]
        self.updates = 0

    def run(self):
        c, _ = self.sk.accept()
        c.sendall(b"RFB 003.008\n")
        assert c.recv(12).startswith(b"RFB ")
        c.sendall(bytes([1, 1]))              # one type: None
        assert c.recv(1) == b"\x01"
        c.sendall(struct.pack(">I", 0))       # OK
        c.recv(1)                             # ClientInit
        pf = struct.pack(">BBBBHHHBBBxxx", 32, 24, 0, 1,
                         255, 255, 255, 0, 8, 16)
        c.sendall(struct.pack(">HH", 16, 8) + pf
                  + struct.pack(">I", 4) + b"mini")
        buf = b""
        while True:
            try:
                msg = c.recv(1)
            except OSError:
                return
            if not msg:
                return
            t = msg[0]
            if t == 0:                        # SetPixelFormat
                c.recv(19)
            elif t == 2:                      # SetEncodings
                pad_n = c.recv(3)
                n = struct.unpack(">H", pad_n[1:])[0]
                c.recv(4 * n)
            elif t == 3:                      # UpdateRequest
                c.recv(9)
                if self.updates == 0:
                    # Raw: red 8x8 block at (0,0)
                    px = bytes([255, 0, 0, 0]) * (8 * 8)
                    c.sendall(struct.pack(">BxH", 0, 1)
                              + struct.pack(">HHHHi", 0, 0, 8, 8, 0)
                              + px)
                else:
                    # CopyRect: copy left half to the right
                    c.sendall(struct.pack(">BxH", 0, 1)
                              + struct.pack(">HHHHi", 8, 0, 8, 8, 1)
                              + struct.pack(">HH", 0, 0))
                self.updates += 1
            else:
                return


def test_rfbsrc_raw_and_copyrect():
    srv = MiniVnc()
    srv.start()
    src = element_factory_make("rfbsrc", host="127.0.0.1",
                               port=srv.port,
                               **{"num-buffers": 2})
    caps = src.get_caps()
    assert caps[0]["width"] == 16 and caps[0]["height"] == 8
    assert src.server_name == "mini"
    src.start()
    b1 = src.create(1)
    r = np.asarray(b1.data[0])[0]
    assert r[0, 0] == 255 and r[0, 12] == 0       # left red only
    b2 = src.create(1)
    r2 = np.asarray(b2.data[0])[0]
    assert r2[0, 12] == 255                       # copied right
    assert src.create(1) is None                  # num-buffers
    src.stop()
