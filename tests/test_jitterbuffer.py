"""rtpjitterbuffer: reordering, dedup, late drop, loss-by-latency,
EOS drain through a pipeline."""

import struct

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.element import element_factory_make
from gstreamer_tpu.core.caps import Caps
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.core.pipeline import State
from gstreamer_tpu.net.rtp import rtp_header, parse_rtp_header


def _pkt(seq, ts=0, payload=b"x"):
    return rtp_header(96, seq, ts, 0xABCD) + payload


def _mk(latency=200):
    e = element_factory_make("rtpjitterbuffer", **{"latency": latency})
    e.set_info(Caps.from_string(
        "application/x-rtp, clock-rate=(int)1000"), None)
    e.start()
    return e


def _seqs(buf):
    return [parse_rtp_header(p)["seq"] for p in buf.data]


def test_reorder():
    e = _mk()
    out = e.host_process(Buffer(data=[_pkt(5), _pkt(7), _pkt(6)],
                                pts=0, batch=3))
    assert _seqs(out) == [5, 6, 7]
    assert e.stats["num-pushed"] == 3


def test_duplicate_and_late():
    e = _mk()
    e.host_process(Buffer(data=[_pkt(10), _pkt(11)], pts=0, batch=2))
    out = e.host_process(Buffer(data=[_pkt(11), _pkt(9), _pkt(12)],
                                pts=0, batch=3))
    # 11 already pushed -> late; 9 before base -> late; 12 in order
    assert _seqs(out) == [12]
    assert e.stats["num-late"] == 2
    e2 = _mk()
    e2.host_process(Buffer(data=[_pkt(3), _pkt(5), _pkt(5)], pts=0,
                           batch=3))
    assert e2.stats["num-duplicates"] == 1


def test_gap_holds_until_latency_then_lost():
    e = _mk(latency=100)     # 100ms at 1kHz clock = 100 ticks
    # push 0, then 2..3 with timestamps inside the latency window
    out = e.host_process(Buffer(data=[_pkt(0, ts=0), _pkt(2, ts=50),
                                      _pkt(3, ts=60)], pts=0, batch=3))
    assert _seqs(out) == [0]        # 2,3 held: waiting for seq 1
    # a much later packet pushes the buffered span past latency
    out = e.host_process(Buffer(data=[_pkt(4, ts=400)], pts=0, batch=1))
    assert _seqs(out) == [2, 3, 4]  # seq 1 declared lost
    assert e.stats["num-lost"] == 1


def test_seq_wraparound():
    e = _mk()
    out = e.host_process(Buffer(
        data=[_pkt(65534), _pkt(0), _pkt(65535), _pkt(1)], pts=0,
        batch=4))
    assert _seqs(out) == [65534, 65535, 0, 1]


def test_pipeline_with_depay_and_eos_drain():
    """udp-style packet list -> jitterbuffer -> rtpL16depay, with the
    final out-of-order tail flushed by the EOS drain."""
    rate = 48000
    samples = (np.arange(32, dtype=np.int16).reshape(16, 2) * 100)
    # 4 packets of 4 frames each, shuffled, one held back past EOS
    pkts = []
    for i in range(4):
        payload = samples[i * 4:(i + 1) * 4].astype(">i2").tobytes()
        pkts.append(rtp_header(97, i, i * 4, 0x1) + payload)
    order = [pkts[0], pkts[2], pkts[1]]      # pkt 3 never sent in-band
    p = parse_launch(
        "appsrc name=in caps=application/x-rtp,media=audio,"
        "encoding-name=L16,clock-rate=48000,channels=2 ! "
        "rtpjitterbuffer name=jb latency=10000 ! rtpL16depay ! "
        "appsink name=s")
    src = p.get_by_name("in")
    src.push_buffer(Buffer(data=order, pts=0, batch=3))
    src.push_buffer(Buffer(data=[pkts[3]], pts=0, batch=1))
    src.end_of_stream()
    p.set_state(State.PLAYING)
    got = []
    while p.tick():
        s = p.get_by_name("s").pull_sample()
        if s is not None:
            got.append(np.asarray(s.buffer.data))
    while True:
        s = p.get_by_name("s").pull_sample()
        if s is None:
            break
        got.append(np.asarray(s.buffer.data))
    out = np.concatenate(got, axis=0)
    np.testing.assert_array_equal(out, samples)
    assert p.get_by_name("jb").stats["num-pushed"] == 4


def test_head_reorder_before_first_push():
    """A packet older than the first-seen seqnum is not late while
    nothing has been pushed yet — the base moves backwards."""
    e = _mk()
    out = e.host_process(Buffer(data=[_pkt(2), _pkt(1)], pts=0, batch=2))
    assert _seqs(out) == [1, 2]
    assert e.stats["num-late"] == 0
