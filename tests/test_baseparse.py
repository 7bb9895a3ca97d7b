"""BaseParse scaffold + CollectPads/DataQueue primitives."""

import threading

import numpy as np

from gstreamer_tpu.core.baseparse import BaseParse
from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.caps import Caps
from gstreamer_tpu.core.collectpads import CollectPads, DataQueue
from gstreamer_tpu.core.element import PadDirection, PadTemplate


class SyncFrameParse(BaseParse):
    """Toy bitstream: frames are 0xA5 <len> <payload...>; anything before
    a 0xA5 is garbage to skip (exercises the resync path)."""
    FACTORY = "testsyncparse"
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, Caps.any()),
        PadTemplate("src", PadDirection.SRC, Caps.any()),
    ]

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self.set_min_frame_size(2)
        self.set_frame_rate(25, 1)

    def handle_frame(self, view):
        if view[0] != 0xA5:
            skip = int(np.argmax(view == 0xA5))
            if view[skip] != 0xA5:
                return 0, len(view)        # no sync in sight: drop all
            return 0, skip
        need = 2 + int(view[1])
        if len(view) < need:
            return 0, 0                    # wait for more
        return need, 0


def make_stream(frames, garbage=b""):
    out = bytearray(garbage)
    for payload in frames:
        out += bytes([0xA5, len(payload)]) + payload
    return np.frombuffer(bytes(out), np.uint8)


def test_baseparse_frames_and_resync():
    p = SyncFrameParse()
    p.start()
    frames = [b"abc", b"defgh"[:3], b"xyz"]
    data = make_stream(frames, garbage=b"\x00\x01\x02")
    out = p.host_process(Buffer(data=data, pts=0, batch=1))
    assert out is not None
    assert out.batch == 3
    got = [bytes(np.asarray(f)[2:]) for f in out.data]
    assert got == [b"abc", b"def", b"xyz"]
    # 25 fps pts interpolation
    assert out.pts == 0 and out.duration == 40_000_000


def test_baseparse_across_chunks():
    p = SyncFrameParse()
    p.start()
    data = make_stream([b"hello", b"world"])
    # split mid-frame: the adapter must reassemble
    out1 = p.host_process(Buffer(data=data[:4], pts=0, batch=1))
    assert out1 is None
    out2 = p.host_process(Buffer(data=data[4:], pts=None, batch=1))
    assert out2 is not None and out2.batch == 2


def test_collectpads():
    c = CollectPads()
    c.add_pad("a")
    c.add_pad("b")
    c.chain("a", 1)
    assert c.peek_collected() is None
    c.chain("b", 2)
    assert c.pop_collected() == {"a": 1, "b": 2}
    c.chain("a", 3)
    c.eos("b")
    assert c.pop_collected() == {"a": 3, "b": None}
    assert not c.all_eos
    c.eos("a")
    assert c.all_eos


def test_dataqueue_bounded_and_flush():
    q = DataQueue(max_items=2)
    assert q.push(1) and q.push(2)
    assert not q.push(3, timeout=0.05)      # full
    got = []

    def consumer():
        while True:
            item = q.pop(timeout=1.0)
            if item is None:
                return
            got.append(item)

    t = threading.Thread(target=consumer)
    t.start()
    q.push(3, timeout=1.0)
    import time
    time.sleep(0.1)
    q.set_flushing()
    t.join(2.0)
    assert got == [1, 2, 3]
