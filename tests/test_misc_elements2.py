"""Tests for the round-4 breadth batch: bz2, RIST aux elements,
dvdsubparse, atscmux, codec-alpha, iqa."""

import struct

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.element import element_factory_make as make_element
from gstreamer_tpu.core.parse import parse_launch


def test_bz2_roundtrip(tmp_path):
    import bz2 as pybz2
    payload = bytes(range(256)) * 200
    enc = make_element("bz2enc")
    enc.start()
    chunks = []
    for off in range(0, len(payload), 7000):
        b = enc.host_process(Buffer(
            data=np.frombuffer(payload[off:off + 7000], np.uint8),
            batch=1))
        if b is not None:
            chunks.append(np.asarray(b.data).tobytes())
    tail = enc.host_process(None)
    if tail is not None:
        chunks.append(np.asarray(tail.data).tobytes())
    compressed = b"".join(chunks)
    assert pybz2.decompress(compressed) == payload

    dec = make_element("bz2dec")
    dec.start()
    out = []
    for off in range(0, len(compressed), 999):
        b = dec.host_process(Buffer(
            data=np.frombuffer(compressed[off:off + 999], np.uint8),
            batch=1))
        if b is not None:
            out.append(np.asarray(b.data).tobytes())
    assert b"".join(out) == payload


def _rtp(seq, ssrc=0x1234, pt=33, payload=b""):
    from gstreamer_tpu.net.rtp import rtp_header
    return rtp_header(pt, seq, 1000 + seq, ssrc) + payload


def test_rist_rtp_ext_roundtrip():
    # 3 TS packets, middle one null -> dropped and flagged, then
    # reinserted by the deext element
    def ts(pid):
        return bytes([0x47, (pid >> 8) & 0x1F, pid & 0xFF, 0x10]) \
            + b"\xab" * 184
    payload = ts(0x100) + ts(0x1FFF) + ts(0x101)
    ext = make_element("ristrtpext",
                       **{"drop-null-ts-packets": True,
                          "sequence-number-extension": True})
    out = ext.host_process(Buffer(data=[_rtp(5, payload=payload)],
                                  batch=1))
    pkt = out.data[0]
    from gstreamer_tpu.net.rtp import parse_rtp_header
    h = parse_rtp_header(pkt)
    assert h["extension_profile"] == (ord('R') << 8 | ord('I'))
    assert len(h["payload"]) == 2 * 188       # null dropped
    deext = make_element("ristrtpdeext")
    back = deext.host_process(Buffer(data=[pkt], batch=1))
    h2 = parse_rtp_header(back.data[0])
    assert h2["extension_profile"] is None
    assert h2["payload"] == ts(0x100) + bytes(
        [0x47, 0x1F, 0xFF, 0x10]) + b"\xff" * 184 + ts(0x101)
    assert deext.max_ext_seqnum == 5


def test_rist_rtx():
    send = make_element("ristrtxsend")
    send.start()
    send.host_process(Buffer(data=[_rtp(10, ssrc=0x5000),
                                   _rtp(11, ssrc=0x5000)], batch=1))
    assert send.request_retransmit(10)
    out = send.host_process(Buffer(data=[_rtp(12, ssrc=0x5000)],
                                   batch=1))
    assert len(out.data) == 2
    from gstreamer_tpu.net.rtp import parse_rtp_header
    rtx = parse_rtp_header(out.data[1])
    assert rtx["seq"] == 10 and rtx["ssrc"] == 0x5001
    recv = make_element("ristrtxreceive")
    fixed = recv.host_process(Buffer(data=[out.data[1]], batch=1))
    h = parse_rtp_header(fixed.data[0])
    assert h["ssrc"] == 0x5000 and h["seq"] == 10
    assert recv.num_rtx_packets == 1


def test_dvdsubparse():
    spu = struct.pack(">H", 20) + b"\x00" * 18   # 20-byte packet
    p = make_element("dvdsubparse")
    p.start()
    # feed in two fragments
    assert p.host_process(Buffer(data=np.frombuffer(spu[:9], np.uint8),
                                 batch=1)) is None
    out = p.host_process(Buffer(data=np.frombuffer(spu[9:], np.uint8),
                                batch=1))
    assert out is not None
    assert bytes(np.asarray(out.data[0]).tobytes()) == spu


def test_atscmux(tmp_path):
    path = str(tmp_path / "out.ts")
    p = parse_launch(
        "videotestsrc num-buffers=4 ! video/x-raw,format=I420,"
        "width=64,height=48,framerate=30/1 ! mpeg2enc ! "
        f"atscmux location={path}")
    p.run()
    p.set_state("null")
    data = open(path, "rb").read()
    assert len(data) % 188 == 0 and data[0] == 0x47
    assert b"GA94" in data                     # ATSC registration


def test_iqa():
    ref = np.random.default_rng(0).integers(
        0, 255, (48, 64), np.uint8)
    noisy = np.clip(ref.astype(int)
                    + np.random.default_rng(1).integers(
                        -20, 20, ref.shape), 0, 255).astype(np.uint8)
    iqa = make_element("iqa")
    out = iqa.host_aggregate({
        "sink_0": Buffer(data=(ref[None],), batch=1),
        "sink_1": Buffer(data=(ref[None],), batch=1),
        "sink_2": Buffer(data=(noisy[None],), batch=1)})
    m = out.meta["iqa-dssim"]
    assert m["sink_1"] < 1e-9          # identical -> dssim 0
    assert m["sink_2"] > m["sink_1"]


def test_codecalpha_registered():
    for f in ("codecalphademux", "vp8alphadecodebin",
              "vp9alphadecodebin"):
        assert make_element(f) is not None


def test_vp8_alpha_decode_bin():
    vpx = pytest.importorskip("gstreamer_tpu.codecs.vpx")
    if not vpx.available():
        pytest.skip("libvpx missing")
    enc = vpx.VpxEncoder("vp8", 64, 48, bitrate_kbps=200)
    y = np.full((48, 64), 120, np.uint8)
    u = np.full((24, 32), 128, np.uint8)
    v = np.full((24, 32), 128, np.uint8)
    pkts = [p for p, _ in enc.encode((y, u, v)) + enc.flush()]
    a_enc = vpx.VpxEncoder("vp8", 64, 48, bitrate_kbps=200)
    ay = np.full((48, 64), 200, np.uint8)
    apkts = [p for p, _ in a_enc.encode((ay, u, v)) + a_enc.flush()]
    bin_ = make_element("vp8alphadecodebin")
    bin_.start()
    out = bin_.host_process(Buffer(
        data=pkts[0], meta={"alpha_data": apkts[0]}, batch=1))
    assert out is not None
    planes = out.data
    assert len(planes) == 4            # A420
    assert abs(int(np.asarray(planes[3]).mean()) - 200) < 10


def test_sei_inserter_udu():
    from gstreamer_tpu.elements.cc_sei import _split_annexb, _parse_sei
    # a fake AU: SPS-ish + one VCL slice nal
    au = (b"\x00\x00\x00\x01\x67\x42\x00\x1e"
          b"\x00\x00\x00\x01\x65\x88\x80\x10")
    ins = make_element("h264seiinserter")
    uuid = bytes(range(16))
    out = ins.host_process(Buffer(
        data=np.frombuffer(au, np.uint8), batch=1,
        meta={"sei-user-data": (uuid, b"hello")}))
    raw = np.asarray(out.data).tobytes()
    nals = list(_split_annexb(raw))
    types = [n[0] & 0x1F for n in nals]
    assert 6 in types                       # SEI present
    sei = nals[types.index(6)]
    # NAL: [6][type 5][len][uuid16][payload]
    assert sei[1] == 5
    assert sei[3:19] == uuid
    assert sei[19:24] == b"hello"
    # SEI must precede the VCL nal
    assert types.index(6) < types.index(5)


def test_h265_timestamper():
    t = make_element("h265timestamper")
    out = t.host_process(Buffer(data=np.zeros(4, np.uint8), batch=1,
                                pts=12345))
    assert out.dts == 12345
