"""GDP payload/depayload: wire format + cross-"process" roundtrips."""

import struct

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.gdp import (HEADER_LEN, PAYLOAD_BUFFER,
                                        PAYLOAD_CAPS, dp_crc, dp_packet,
                                        dp_parse)


class TestWireFormat:
    def test_crc_ccitt_false_vector(self):
        # standard CRC-16/CCITT-FALSE check value
        assert dp_crc(b"123456789") == 0x29B1

    def test_packet_roundtrip(self):
        pkt = dp_packet(PAYLOAD_BUFFER, b"hello", pts=123,
                        duration=456)
        assert len(pkt) == HEADER_LEN + 5
        assert pkt[0] == 1 and pkt[1] == 0
        ptype, payload, pts, dur, nxt = dp_parse(pkt, 0)
        assert (ptype, payload, pts, dur) == (PAYLOAD_BUFFER,
                                              b"hello", 123, 456)
        assert nxt == len(pkt)

    def test_corruption_detected(self):
        pkt = bytearray(dp_packet(PAYLOAD_BUFFER, b"payload",
                                  crc_payload=True))
        pkt[HEADER_LEN + 2] ^= 0xFF
        with pytest.raises(ValueError):
            dp_parse(bytes(pkt), 0)

    def test_reference_default_flags(self):
        # gstgdppay.c:60 defaults: crc-header=TRUE crc-payload=FALSE
        pkt = dp_packet(PAYLOAD_BUFFER, b"payload")
        assert pkt[2] == 0x01
        assert struct.unpack(">H", pkt[60:62])[0] == 0
        assert struct.unpack(">H", pkt[58:60])[0] != 0

    def test_header_field_layout(self):
        pkt = dp_packet(PAYLOAD_CAPS, b"x\0", pts=None)
        assert struct.unpack(">H", pkt[4:6])[0] == PAYLOAD_CAPS
        assert struct.unpack(">I", pkt[6:10])[0] == 2
        assert struct.unpack(">Q", pkt[10:18])[0] == 2 ** 64 - 1


class TestRoundtrip:
    def test_video_over_gdp_file(self, tmp_path):
        path = tmp_path / "v.gdp"
        p = parse_launch(
            f"videotestsrc num-buffers=4 pattern=gradient ! "
            f"video/x-raw,format=I420,width=48,height=32,"
            f"framerate=10/1 ! gdppay ! filesink location={path}")
        p.run()
        p.set_state("null")

        d = parse_launch(
            f"gdpdepay location={path} ! appsink name=out")
        d.run()
        outs = []
        while (s := d.get_by_name("out").pull_sample()) is not None:
            caps = s.caps[0]
            assert caps["width"] == 48 and caps["format"] == "I420"
            for k in range(s.buffer.batch):
                outs.append([np.asarray(x)[k] for x in s.buffer.data])
        assert len(outs) == 4

        g = parse_launch(
            "videotestsrc num-buffers=4 pattern=gradient ! "
            "video/x-raw,format=I420,width=48,height=32,"
            "framerate=10/1 ! appsink name=out")
        g.run()
        wants = []
        while (s := g.get_by_name("out").pull_sample()) is not None:
            for k in range(s.buffer.batch):
                wants.append([np.asarray(x)[k]
                              for x in s.buffer.data])
        for a, b in zip(outs, wants):
            for x, y in zip(a, b):
                np.testing.assert_array_equal(x, y)

    def test_audio_over_gdp_file(self, tmp_path):
        path = tmp_path / "a.gdp"
        p = parse_launch(
            f"audiotestsrc num-buffers=3 samplesperbuffer=500 "
            f"wave=square ! audio/x-raw,format=S16LE,rate=8000,"
            f"channels=2 ! gdppay ! filesink location={path}")
        p.run()
        p.set_state("null")
        d = parse_launch(
            f"gdpdepay location={path} ! appsink name=out")
        d.run()
        outs = []
        while (s := d.get_by_name("out").pull_sample()) is not None:
            outs.append(np.asarray(s.buffer.data))
        got = np.concatenate(outs)
        assert got.shape == (1500, 2) and got.dtype == np.int16
