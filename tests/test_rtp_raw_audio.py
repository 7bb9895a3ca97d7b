"""L8/L24 RTP profiles, asteriskh263, av1dec alias."""

import struct

import numpy as np

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.element import (element_factory_make,
                                        factory_exists)
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.net.rtp import parse_rtp_header, rtp_header


class TestL8:
    def test_pipeline_roundtrip(self):
        p = parse_launch(
            "audiotestsrc num-buffers=4 samplesperbuffer=800 "
            "wave=sine freq=440 ! "
            "audio/x-raw,format=U8,rate=8000,channels=1 ! "
            "rtpL8pay ! rtpL8depay "
            "caps=\"audio/x-raw,format=U8,rate=8000,channels=1\" ! "
            "appsink name=out")
        p.run()
        outs = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            outs.append(np.asarray(s.buffer.data).reshape(-1))
        got = np.concatenate(outs)
        assert len(got) == 3200
        assert got.dtype == np.uint8
        assert got.min() < 100 and got.max() > 150   # real sine

    def test_wire_is_offset_binary(self):
        pay = element_factory_make("rtpL8pay", mtu=100)
        x = np.full((64, 1), 128, np.uint8)           # silence
        out = pay.host_process(Buffer(data=x, pts=0))
        pkt = out.data[0]
        info = parse_rtp_header(pkt)
        assert info["payload"] == b"\x80" * 64        # RFC 3551 offset


class TestL24:
    def test_packed_roundtrip(self):
        pay = element_factory_make("rtpL24pay", mtu=1400)
        dep = element_factory_make("rtpL24depay")
        dep._ainfo = type("A", (), {"channels": 2})()
        # int32 samples -> 24-bit BE wire
        x = np.array([[0x123456, -0x123456], [0x7FFFFF, -0x800000]],
                     np.int32)
        out = pay.host_process(Buffer(data=x, pts=0))
        info = parse_rtp_header(out.data[0])
        assert info["payload"][:3] == b"\x12\x34\x56"
        assert len(info["payload"]) == 12
        back = dep.host_process(Buffer(data=out.data, pts=0))
        raw = np.asarray(back.data).reshape(-1)
        assert bytes(raw[:3]) == b"\x12\x34\x56"

    def test_timestamp_advances_per_frame(self):
        pay = element_factory_make("rtpL24pay", mtu=12 + 30)
        x = np.zeros((20, 1), np.int32)
        out = pay.host_process(Buffer(data=x, pts=0))
        stamps = [parse_rtp_header(p)["timestamp"] for p in out.data]
        assert stamps[0] == 0 and stamps[1] == 10   # 30 bytes / 3Bps


class TestAsteriskH263:
    def test_framing(self):
        el = element_factory_make("asteriskh263")
        pay1 = b"\x00\x00\x81\x02h263data"
        pay2 = b"more"
        pkts = [rtp_header(96, 0, 1000, 7) + pay1,
                rtp_header(96, 1, 4000, 7, marker=True) + pay2]
        out = el.host_process(Buffer(data=pkts, pts=0))
        f1, f2 = out.data
        ts1, len1 = struct.unpack(">IH", f1[:6])
        assert ts1 == 0 and len1 == len(pay1)       # first delta = 0
        assert f1[6:] == pay1
        ts2, len2 = struct.unpack(">IH", f2[:6])
        assert ts2 == 3000                          # delta samples
        assert len2 == 0x8000 | len(pay2)           # marker bit
        assert f2[6:] == pay2


class TestAv1DecAlias:
    def test_registered_with_libav(self):
        # registered exactly when the libav shim shipped avdec_av1
        assert factory_exists("av1dec") == factory_exists("avdec_av1")
