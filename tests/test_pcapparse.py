"""pcapparse: synthetic captures through the element
(reference gst-plugins-bad/gst/pcapparse/gstpcapparse.c)."""

import struct

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.pcapparse import scan_frame


def _ipv4(payload, proto=17, src="10.0.0.1", dst="10.0.0.2",
          sport=5004, dport=5004):
    def ip(s):
        v = 0
        for p in s.split("."):
            v = (v << 8) | int(p)
        return v
    if proto == 17:
        l4 = struct.pack(">HHHH", sport, dport,
                         8 + len(payload), 0) + payload
    else:
        l4 = struct.pack(">HHIIBBHHH", sport, dport, 0, 0,
                         5 << 4, 0x18, 65535, 0, 0) + payload
    total = 20 + len(l4)
    iph = struct.pack(">BBHHHBBHII", 0x45, 0, total, 0, 0, 64,
                      proto, 0, ip(src), ip(dst))
    return iph + l4


def _ether(ipkt):
    return b"\xaa" * 6 + b"\xbb" * 6 + struct.pack(">H", 0x800) + ipkt


def _pcap(pkts, linktype=1, nanos=False, le=True):
    magic = 0xA1B23C4D if nanos else 0xA1B2C3D4
    e = "<" if le else ">"
    out = struct.pack(e + "IHHiIII", magic, 2, 4, 0, 0, 0x40000,
                      linktype)
    for k, p in enumerate(pkts):
        out += struct.pack(e + "IIII", 100 + k, 500, len(p), len(p))
        out += p
    return out


def _run(blob, launch="pcapparse"):
    p = parse_launch(f"appsrc name=in ! raw/x-pcap ! {launch} "
                     f"! appsink name=out")
    p.get_by_name("in").push_buffer(
        Buffer(data=np.frombuffer(blob, np.uint8), pts=0))
    p.get_by_name("in").end_of_stream()
    p.run()
    sink = p.get_by_name("out")
    got = []
    while (s := sink.pull_sample()) is not None:
        d = s.buffer.data
        for b in (d if isinstance(d, (list, tuple)) else [d]):
            arr = np.asarray(b)
            if arr.ndim > 1:             # stacked equal-size frames
                got.extend(bytes(row.tobytes()) for row in arr)
            else:
                got.append(arr.tobytes())
    return got, sink


class TestScanFrame:
    def test_udp_ethernet(self):
        pkt = _ether(_ipv4(b"hello-rtp"))
        off, size = scan_frame(pkt, 1)
        assert pkt[off:off + size] == b"hello-rtp"

    def test_tcp_ethernet(self):
        pkt = _ether(_ipv4(b"tcp-payload", proto=6))
        off, size = scan_frame(pkt, 1)
        assert pkt[off:off + size] == b"tcp-payload"

    def test_vlan_tag(self):
        ip = _ipv4(b"vlan-data")
        pkt = b"\xaa" * 6 + b"\xbb" * 6 + struct.pack(">H", 0x8100) \
            + struct.pack(">H", 42) + struct.pack(">H", 0x800) + ip
        off, size = scan_frame(pkt, 1)
        assert pkt[off:off + size] == b"vlan-data"

    def test_raw_linktype(self):
        pkt = _ipv4(b"raw-ip")
        off, size = scan_frame(pkt, 101)
        assert pkt[off:off + size] == b"raw-ip"

    def test_filters(self):
        pkt = _ether(_ipv4(b"x", sport=1000, dport=2000))
        assert scan_frame(pkt, 1, src_port=1000) is not None
        assert scan_frame(pkt, 1, src_port=1001) is None
        assert scan_frame(pkt, 1, dst_port=2000) is not None
        assert scan_frame(pkt, 1, dst_port=2001) is None

    def test_fragment_rejected(self):
        pkt = bytearray(_ether(_ipv4(b"frag")))
        pkt[14 + 6] = 0x20                    # more-fragments flag
        pkt[14 + 7] = 0x01
        assert scan_frame(bytes(pkt), 1) is None

    def test_ipv6_rejected(self):
        pkt = bytearray(_ether(_ipv4(b"sixsixsix")))
        pkt[14] = 0x60
        assert scan_frame(bytes(pkt), 1) is None


class TestElement:
    def test_udp_payloads(self):
        pkts = [_ether(_ipv4(b"packet-%d" % k)) for k in range(4)]
        got, _ = _run(_pcap(pkts))
        assert got == [b"packet-%d" % k for k in range(4)]

    def test_big_endian_nanos(self):
        pkts = [_ether(_ipv4(b"be-packet"))]
        got, sink = _run(_pcap(pkts, nanos=True, le=False))
        assert got == [b"be-packet"]

    def test_port_filter_drops(self):
        pkts = [_ether(_ipv4(b"keep", dport=5004)),
                _ether(_ipv4(b"drop", dport=9999)),
                _ether(_ipv4(b"keep2", dport=5004))]
        got, _ = _run(_pcap(pkts), "pcapparse dst-port=5004")
        assert got == [b"keep", b"keep2"]

    def test_ip_filter(self):
        pkts = [_ether(_ipv4(b"mine", src="192.168.1.5")),
                _ether(_ipv4(b"other", src="192.168.1.6"))]
        got, _ = _run(_pcap(pkts), "pcapparse src-ip=192.168.1.5")
        assert got == [b"mine"]

    def test_pts_from_record_header(self):
        pkts = [_ether(_ipv4(b"tick"))]
        p = parse_launch("appsrc name=in ! raw/x-pcap ! pcapparse "
                         "ts-offset=7 ! appsink name=out")
        p.get_by_name("in").push_buffer(
            Buffer(data=np.frombuffer(_pcap(pkts), np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        # ts_sec=100, usec=500 -> 100s + 500us + 7ns
        assert s.buffer.pts == 100 * 1_000_000_000 + 500_000 + 7

    def test_bad_magic(self):
        with pytest.raises(ValueError):
            _run(b"\0" * 64)
