"""Closed captions: ccutils conversions, CDP packets, line21, the
converter/combiner/extractor elements
(gst-plugins-bad/gst/closedcaption/)."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.video import cc as ccutils


class TestPairConversions:
    def test_raw_to_s334(self):
        out = ccutils.cea608_raw_to_s334_1a(b"\x94\x2c\x91\xb0", 0)
        assert out == b"\x80\x94\x2c\x80\x91\xb0"
        out1 = ccutils.cea608_raw_to_s334_1a(b"\x94\x2c", 1)
        assert out1 == b"\x00\x94\x2c"

    def test_raw_to_cc_data_markers(self):
        # gstccconverter.c:833 — 0xfc field 0 / 0xfd field 1
        assert ccutils.cea608_raw_to_cc_data(b"\x94\x2c", 0) == \
            b"\xfc\x94\x2c"
        assert ccutils.cea608_raw_to_cc_data(b"\x94\x2c", 1) == \
            b"\xfd\x94\x2c"

    def test_truncates_to_three_pairs(self):
        out = ccutils.cea608_raw_to_s334_1a(b"\x01\x02" * 5, 0)
        assert len(out) == 9

    def test_cc_data_roundtrips(self):
        cc = b"\xfc\x94\x2c\xfd\x91\xb0"
        assert ccutils.cc_data_to_cea608_raw(cc, 0) == b"\x94\x2c"
        assert ccutils.cc_data_to_cea608_raw(cc, 1) == b"\x91\xb0"
        s334 = ccutils.cc_data_to_s334_1a(cc)
        assert s334 == b"\x80\x94\x2c\x00\x91\xb0"
        assert ccutils.s334_1a_to_cc_data(s334) == cc


class TestCdp:
    def test_packet_structure(self):
        cdp = ccutils.cc_data_to_cdp(b"\xfc\x94\x2c", 0x1234, 30, 1)
        assert cdp[:2] == b"\x96\x69"
        assert cdp[2] == len(cdp)
        assert cdp[3] == 0x5F                     # 30fps idx
        assert cdp[5:7] == b"\x12\x34"            # sequence
        i = cdp.index(0x72)
        assert cdp[i + 1] == 0xE0 | 20            # max_cc_count @30fps
        assert sum(cdp) % 256 == 0                # checksum closes

    def test_roundtrip_with_timecode(self):
        cdp = ccutils.cc_data_to_cdp(b"\xfc\x01\x02", 9, 25, 1,
                                     tc=(1, 2, 3, 4))
        cc, tc, fps = ccutils.cdp_to_cc_data(cdp)
        assert cc == b"\xfc\x01\x02"
        assert tc == (1, 2, 3, 4)
        assert fps == 0x3F

    def test_padding_dropped(self):
        cdp = ccutils.cc_data_to_cdp(b"\xfc\x01\x02", 0, 60, 1)
        cc, _, _ = ccutils.cdp_to_cc_data(cdp)
        assert cc == b"\xfc\x01\x02"              # 0xfa pads removed

    def test_checksum_verified(self):
        cdp = bytearray(ccutils.cc_data_to_cdp(b"\xfc\x01\x02", 0,
                                               30, 1))
        cdp[7] ^= 0xFF
        with pytest.raises(ValueError):
            ccutils.cdp_to_cc_data(bytes(cdp))

    def test_unsupported_framerate(self):
        with pytest.raises(ValueError):
            ccutils.cc_data_to_cdp(b"", 0, 17, 1)


class TestLine21Waveform:
    @pytest.mark.parametrize("width", [320, 640, 720, 1024])
    def test_roundtrip(self, width):
        for pair in (b"\x94\x2c", b"\x00\x00", b"\xff\xff",
                     b"\x12\x34"):
            line = ccutils.line21_encode_line(width, pair)
            assert ccutils.line21_decode_line(line) == pair

    def test_blank_line_rejected(self):
        assert ccutils.line21_decode_line(
            np.full(640, 16, np.uint8)) is None


class TestElements:
    def test_ccconverter_raw_cdp_raw(self):
        p = parse_launch(
            'appsrc name=in ! closedcaption/x-cea-608,format=raw,'
            'framerate=30/1 ! ccconverter ! closedcaption/x-cea-708,'
            'format=cdp ! ccconverter ! closedcaption/x-cea-608,'
            'format=raw ! appsink name=out')
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(b"\x94\x2c", np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        got = np.asarray(p.get_by_name("out").pull_sample()
                         .buffer.data).tobytes()
        assert got == b"\x94\x2c"

    def test_combiner_line21_chain(self):
        p = parse_launch(
            'cccombiner name=c videotestsrc num-buffers=2 ! '
            'video/x-raw,format=I420,width=128,height=96,'
            'framerate=30/1 ! c.sink '
            'appsrc name=cap ! closedcaption/x-cea-608,format=raw,'
            'framerate=30/1 ! c.caption '
            'c. ! line21encoder ! line21decoder ! appsink name=out')
        cap = p.get_by_name("cap")
        cap.push_buffer(Buffer(
            data=np.frombuffer(b"\x94\x2c", np.uint8), pts=0))
        cap.push_buffer(Buffer(
            data=np.frombuffer(b"\x91\xb0", np.uint8),
            pts=33_000_000))
        cap.end_of_stream()
        p.run()
        pairs = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            m = (s.buffer.meta or {}).get("closedcaption")
            if m:
                pairs.extend(m[1])
        assert b"\x94\x2c" in pairs and b"\x91\xb0" in pairs

    def test_ccextractor_routes(self):
        p = parse_launch(
            'cccombiner name=c videotestsrc num-buffers=1 ! '
            'video/x-raw,format=I420,width=64,height=48,'
            'framerate=30/1 ! c.sink '
            'appsrc name=cap ! closedcaption/x-cea-608,format=raw,'
            'framerate=30/1 ! c.caption '
            'c. ! ccextractor name=x x.src ! appsink name=video '
            'x.caption_0 ! appsink name=cc')
        p.get_by_name("cap").push_buffer(Buffer(
            data=np.frombuffer(b"\x94\x2c", np.uint8), pts=0))
        p.get_by_name("cap").end_of_stream()
        p.run()
        v = p.get_by_name("video").pull_sample()
        assert v is not None
        c = p.get_by_name("cc").pull_sample()
        assert c is not None
        blobs = c.buffer.data
        raw = np.asarray(blobs[0] if isinstance(blobs, (list, tuple))
                         else blobs).tobytes()
        assert raw == b"\x94\x2c"
        assert c.caps[0].name == "closedcaption/x-cea-608"

    def test_cea608mux(self):
        p = parse_launch(
            'cea608mux name=m '
            'appsrc name=f1 ! closedcaption/x-cea-608,format=raw,'
            'framerate=30/1 ! m.sink_0 '
            'appsrc name=f2 ! closedcaption/x-cea-608,format=raw,'
            'framerate=30/1 ! m.sink_1 '
            'm. ! appsink name=out')
        p.get_by_name("f1").push_buffer(Buffer(
            data=np.frombuffer(b"\x94\x2c", np.uint8), pts=0))
        p.get_by_name("f2").push_buffer(Buffer(
            data=np.frombuffer(b"\x91\xb0", np.uint8), pts=0))
        p.get_by_name("f1").end_of_stream()
        p.get_by_name("f2").end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        got = np.asarray(s.buffer.data).tobytes()
        assert got == b"\x80\x94\x2c\x00\x91\xb0"
