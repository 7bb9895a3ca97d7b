"""RFC 8285 RTP header extensions + the standard extension elements
(gstrtphdrext.c; rtphdrextclientaudiolevel RFC 6464, sdes mid/rid
RFC 8843/8852, ntp-64 RFC 6051, twcc, colorspace)."""

import numpy as np
import pytest

from gstreamer_tpu.core.element import element_factory_make
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.native import av as native_av
from gstreamer_tpu.net.rtp import parse_rtp_header, rtp_header
from gstreamer_tpu.net.rtp_hdrext import (build_one_byte_extensions,
                                          parse_one_byte_extensions)

needs_av = pytest.mark.skipif(not native_av.available(),
                              reason="libavcodec shim unavailable")


def test_one_byte_block_roundtrip():
    items = [(1, b"\xaa"), (3, b"\x01\x02"), (14, b"x" * 16)]
    block = build_one_byte_extensions(items)
    h = parse_rtp_header(rtp_header(96, 0, 0, 1, extension=block)
                         + b"PAYLOAD")
    assert h["extension_profile"] == 0xBEDE
    assert h["payload"] == b"PAYLOAD"
    exts = parse_one_byte_extensions(h["extension_profile"],
                                     h["extension_data"])
    assert exts == {1: b"\xaa", 3: b"\x01\x02", 14: b"x" * 16}


def test_parse_header_without_extension_unchanged():
    h = parse_rtp_header(rtp_header(96, 7, 1234, 5) + b"DATA")
    assert h["extension_profile"] is None
    assert h["payload"] == b"DATA"
    assert h["seq"] == 7


def test_extension_element_values():
    lvl = element_factory_make("rtphdrextclientaudiolevel",
                               id=1, level=42, voice=True)
    assert lvl.read(lvl.write()) == {"voice": True, "level": 42}
    mid = element_factory_make("rtphdrextmid", id=2, value="a1")
    assert mid.read(mid.write()) == "a1"
    sid = element_factory_make("rtphdrextstreamid", id=4, value="hi")
    assert sid.read(sid.write()) == "hi"
    ntp = element_factory_make("rtphdrextntp64", id=5,
                               ntp=0x0102030405060708)
    assert ntp.read(ntp.write()) == 0x0102030405060708
    twcc = element_factory_make("rtphdrexttwcc", id=6)
    assert [twcc.read(twcc.write()) for _ in range(3)] == [0, 1, 2]
    cs = element_factory_make("rtphdrextcolorspace", id=7,
                              primaries=9, transfer=16, matrix=9,
                              full_range=True)
    assert cs.read(cs.write()) == {"primaries": 9, "transfer": 16,
                                   "matrix": 9, "full_range": True}


@needs_av
def test_payloader_writes_extensions_and_depay_survives():
    p = parse_launch(
        "audiotestsrc num-buffers=2 samplesperbuffer=4096 ! "
        "audio/x-raw,rate=48000,channels=2,format=S16LE ! "
        "avenc_opus ! rtpopuspay name=pay ! appsink name=out")
    pay = p.get_by_name("pay")
    lvl = element_factory_make("rtphdrextclientaudiolevel",
                               id=1, level=12)
    twcc = element_factory_make("rtphdrexttwcc", id=3)
    pay.add_extension(lvl)
    pay.add_extension(twcc)
    p.run()
    sink = p.get_by_name("out")
    pkts = []
    while (s := sink.pull_sample()) is not None:
        d = s.buffer.data
        pkts.extend(d if isinstance(d, list) else [d])
    assert len(pkts) >= 2
    seqs = []
    for raw in pkts:
        raw = (bytes(raw) if isinstance(raw, (bytes, bytearray))
               else np.asarray(raw).tobytes())
        h = parse_rtp_header(raw)
        exts = parse_one_byte_extensions(h["extension_profile"],
                                         h["extension_data"])
        assert exts[1] == bytes([12])
        seqs.append(twcc.read(exts[3]))
    assert seqs == list(range(len(pkts)))    # twcc counts packets
    # depayloading a stream with extensions must still decode
    p2 = parse_launch(
        "audiotestsrc num-buffers=2 samplesperbuffer=4096 ! "
        "audio/x-raw,rate=48000,channels=2,format=S16LE ! "
        "avenc_opus ! rtpopuspay name=pay ! rtpopusdepay ! "
        "avdec_opus ! appsink name=out")
    p2.get_by_name("pay").add_extension(
        element_factory_make("rtphdrextmid", id=2, value="a1"))
    p2.run()
    s = p2.get_by_name("out").pull_sample()
    assert s is not None and np.asarray(s.buffer.data).shape[1] == 2
