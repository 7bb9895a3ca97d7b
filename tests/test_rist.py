"""RIST simple profile (gstristsink.c / gstristsrc.c): NACK forms,
lossless transport, and loss recovered via RTCP retransmission
through a lossy relay."""

import socket
import struct
import threading
import time

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.net import rtcp
from gstreamer_tpu.net.rist import RistSink, RistSrc
from gstreamer_tpu.net.rtp import parse_rtp_header, rtp_header


def _media(n, seq0=100, ssrc=0xABCD):
    rng = np.random.default_rng(1)
    return [rtp_header(96, seq0 + i, 3000 * i, ssrc)
            + bytes(rng.integers(0, 256, 64, np.uint8))
            for i in range(n)]


# ---------------------------------------------------------------- NACK forms

def test_generic_nack_roundtrip():
    seqs = [10, 11, 13, 26, 27, 40]
    raw = rtcp.build_generic_nack(1, 0xABCD, seqs)
    (pkt,) = rtcp.parse_compound(raw)
    assert pkt.ptype == rtcp.TYPE_RTPFB
    assert pkt.fb_fmt == rtcp.RTPFB_FMT_NACK
    assert pkt.fb_media_ssrc == 0xABCD
    assert sorted(rtcp.parse_generic_nack(pkt)) == seqs


def test_generic_nack_wraparound():
    seqs = [0xFFFE, 0xFFFF, 0, 1]
    raw = rtcp.build_generic_nack(1, 2, seqs)
    (pkt,) = rtcp.parse_compound(raw)
    assert set(rtcp.parse_generic_nack(pkt)) == set(seqs)


def test_rist_range_nack_roundtrip():
    raw = rtcp.build_rist_nack(0xABCD, [(100, 2), (200, 0)])
    (pkt,) = rtcp.parse_compound(raw)
    assert pkt.ptype == rtcp.TYPE_APP and pkt.app_name == "RIST"
    assert rtcp.parse_rist_nack(pkt) == [100, 101, 102, 200]


# ---------------------------------------------------------- lossy UDP relay

class LossyRelay:
    """Bidirectional UDP relay dropping the FIRST copy of chosen media
    seqnums (retransmissions pass), forwarding RTCP both ways."""

    def __init__(self, dst_port, drop_seqs=()):
        self.dst = ("127.0.0.1", dst_port)
        self.drop = set(drop_seqs)
        # the sink addresses RTCP at media-port+1, so bind a pair
        self.media, self.rtcp = _adjacent_sockets()
        self.port = self.media.getsockname()[1]
        self.rtcp_port = self.rtcp.getsockname()[1]
        self._sender_rtcp = None
        self._running = True
        self.dropped = 0
        self._threads = [
            threading.Thread(target=self._media_loop, daemon=True),
            threading.Thread(target=self._rtcp_loop, daemon=True)]
        for t in self._threads:
            t.start()

    def _media_loop(self):
        self.media.settimeout(0.05)
        while self._running:
            try:
                data, _ = self.media.recvfrom(65536)
            except socket.timeout:
                continue
            except OSError:
                return
            try:
                seq = parse_rtp_header(data)["seq"]
            except (struct.error, IndexError):
                seq = None
            if seq in self.drop:
                self.drop.discard(seq)
                self.dropped += 1
                continue
            self.media.sendto(data, self.dst)

    def _rtcp_loop(self):
        self.rtcp.settimeout(0.05)
        dst_rtcp = (self.dst[0], self.dst[1] + 1)
        while self._running:
            try:
                data, addr = self.rtcp.recvfrom(65536)
            except socket.timeout:
                continue
            except OSError:
                return
            if addr == dst_rtcp:                  # receiver -> sender
                if self._sender_rtcp:
                    self.rtcp.sendto(data, self._sender_rtcp)
            else:                                  # sender -> receiver
                self._sender_rtcp = addr
                self.rtcp.sendto(data, dst_rtcp)

    def close(self):
        self._running = False
        for t in self._threads:
            t.join(1.0)
        self.media.close()
        self.rtcp.close()


def _run_transfer(n_pkts, drop_seqs, nack_type="generic",
                  direct=False):
    src = RistSrc(address="127.0.0.1", port=_free_port_pair(),
                  **{"reorder-section": 0.12, "nack-type": nack_type,
                     "timeout": 1.0})
    src.start()
    relay = None
    if direct:
        sink = RistSink(address="127.0.0.1", port=src.bound_port)
    else:
        relay = LossyRelay(src.bound_port, drop_seqs)
        sink = RistSink(address="127.0.0.1", port=relay.port)
    sink.start()
    pkts = _media(n_pkts)

    got = []

    def feeder():
        for i in range(0, n_pkts, 4):
            sink.render(Buffer(data=pkts[i:i + 4], batch=1))
            time.sleep(0.005)

    th = threading.Thread(target=feeder, daemon=True)
    th.start()
    deadline = time.monotonic() + 8.0
    while len(got) < n_pkts and time.monotonic() < deadline:
        buf = src.create(1)
        if buf is None:
            break
        got.extend(bytes(p) for p in buf.data)
    th.join(2.0)
    src.stop()
    sink.stop()
    if relay:
        relay.close()
    return pkts, got, sink, src, relay


def _adjacent_sockets():
    """Two UDP sockets bound to adjacent ports (p, p+1)."""
    for _ in range(64):
        s1 = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s1.bind(("127.0.0.1", 0))
        p = s1.getsockname()[1]
        s2 = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        try:
            s2.bind(("127.0.0.1", p + 1))
        except OSError:
            s1.close()
            s2.close()
            continue
        return s1, s2
    raise RuntimeError("no adjacent udp port pair free")


def _free_port_pair():
    """First port of a free adjacent UDP port pair."""
    s1, s2 = _adjacent_sockets()
    p = s1.getsockname()[1]
    s1.close()
    s2.close()
    return p


def test_rist_lossless_direct():
    pkts, got, sink, src, _ = _run_transfer(24, (), direct=True)
    assert got == pkts
    assert src.stats["lost"] == 0
    assert sink.stats["retransmitted"] == 0


@pytest.mark.parametrize("nack_type", ["generic", "range"])
def test_rist_loss_recovered(nack_type):
    # drop seqs 103, 104, 110 on first transmission only
    drop = {103, 104, 110}
    pkts, got, sink, src, relay = _run_transfer(
        24, drop, nack_type=nack_type)
    assert relay.dropped == 3
    assert sink.stats["retransmitted"] >= 3
    assert src.stats["recovered"] >= 3
    assert got == pkts            # fully recovered, in order
    assert src.stats["lost"] == 0
