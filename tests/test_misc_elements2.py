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


def _minimal_mod():
    """Author a minimal 4-channel ProTracker MOD (31-instrument,
    'M.K.') with one silent pattern and one square-wave sample."""
    import struct as st
    name = b"gtpu test mod".ljust(20, b"\x00")
    smp = (b"square".ljust(22, b"\x00")
           + st.pack(">H", 16)          # length in words (32 bytes)
           + bytes([0])                 # finetune
           + bytes([64])                # volume
           + st.pack(">HH", 0, 1))      # repeat start/len
    empties = b"".join(
        bytes(22) + st.pack(">H", 0) + bytes([0, 0])
        + st.pack(">HH", 0, 1) for _ in range(30))
    head = (name + smp + empties
            + bytes([1])                # song length
            + bytes([127])              # restart
            + bytes([0]) + bytes(127)   # pattern order
            + b"M.K.")
    pattern = bytearray(1024)
    # row 0, channel 0: sample 1, period 428 (C-2), no effect
    pattern[0] = (1 & 0xF0) | ((428 >> 8) & 0x0F)
    pattern[1] = 428 & 0xFF
    pattern[2] = (1 & 0x0F) << 4
    sample = bytes((64 if i % 16 < 8 else 192) for i in range(32))
    return head + bytes(pattern) + sample


def test_openmptdec():
    from gstreamer_tpu.elements import ext_music
    if ext_music._get_mpt() is None:
        pytest.skip("libopenmpt missing")
    dec = make_element("openmptdec")
    dec.start()
    dec.host_process(Buffer(
        data=np.frombuffer(_minimal_mod(), np.uint8), batch=1))
    out = dec.host_process(None)
    assert out is not None
    pcm = np.asarray(out.data)
    assert pcm.shape[1] == 2 and pcm.shape[0] > 1000
    assert float(np.abs(pcm).max()) > 1e-4     # the note sounded


def test_bs2b_crossfeed():
    el = make_element("bs2b")
    el._rate = 48000
    # left-only low-frequency tone: the lowpass crossfeed bleeds it
    # into the right at roughly the feed level (~ -6.75 dB for the
    # default 4.5 dB setting)
    t = np.arange(4800) / 48000.0
    x = np.zeros((4800, 2), np.float32)
    x[:, 0] = np.sin(2 * np.pi * 100 * t)
    out = el.host_process(Buffer(data=x, batch=1))
    y = np.asarray(out.data)[2400:]              # skip warmup
    assert float(np.abs(y[:, 1]).max()) > 0.2    # bleed present
    assert float(np.abs(y[:, 0]).max()) > float(np.abs(y[:, 1]).max())


def test_libde265dec_matches_avdec():
    from gstreamer_tpu.elements import de265
    if not de265.available():
        pytest.skip("libde265 missing")
    from gstreamer_tpu.native import av as native_av
    if native_av.get_lib() is None:
        pytest.skip("libavcodec missing")
    # encode a short HEVC stream with x265 via the existing element
    p = parse_launch(
        "videotestsrc num-buffers=5 ! video/x-raw,format=I420,"
        "width=64,height=48,framerate=30/1 ! x265enc ! "
        "appsink name=out")
    p.run()
    sink = p.get_by_name("out")
    blobs = []
    while True:
        s = sink.pull_sample()
        if s is None:
            break
        d = s.buffer.data
        for b in (d if isinstance(d, list) else [d]):
            blobs.append(np.asarray(b).tobytes())
    stream = b"".join(blobs)
    assert stream
    dec = make_element("libde265dec")
    dec.start()
    outs = []
    r = dec.host_process(Buffer(
        data=np.frombuffer(stream, np.uint8), batch=1))
    if r is not None:
        outs.append(r)
    r = dec.host_process(None)
    if r is not None:
        outs.append(r)
    total = sum(o.batch for o in outs)
    assert total == 5
    y = np.asarray(outs[-1].data[0])
    assert y.shape[-2:] == (48, 64)


def test_avtp_aaf_roundtrip():
    pay = make_element("avtpaafpay")
    pay._rate, pay._channels = 48000, 2
    pcm = (np.arange(96) - 48).astype(">i2").reshape(-1, 2)
    out = pay.host_process(Buffer(data=np.frombuffer(
        pcm.tobytes(), np.uint8), batch=1, pts=1_000_000))
    pdu = out.data[0]
    from gstreamer_tpu.net.avtp import parse_pdu
    h = parse_pdu(pdu)
    assert h["subtype"] == 0x02 and h["rate"] == 48000
    assert h["channels"] == 2
    depay = make_element("avtpaafdepay")
    back = depay.host_process(Buffer(data=[pdu], batch=1))
    got = np.asarray(back.data)
    assert np.array_equal(got, pcm.astype(np.int64))


def test_avtp_cvf_roundtrip_fua():
    pay = make_element("avtpcvfpay", mtu=50)
    big_nal = bytes([0x65]) + bytes(range(256)) * 2   # > mtu: FU-A
    small_nal = bytes([0x67, 1, 2, 3])
    au = (b"\x00\x00\x00\x01" + small_nal
          + b"\x00\x00\x00\x01" + big_nal)
    out = pay.host_process(Buffer(
        data=np.frombuffer(au, np.uint8), batch=1, pts=0))
    assert len(out.data) > 5                # fragmented
    depay = make_element("avtpcvfdepay")
    back = depay.host_process(Buffer(data=list(out.data), batch=1))
    raw = np.asarray(back.data[0]).tobytes()
    assert raw == au


def test_avtp_sink_src_loopback():
    import threading
    try:
        src = make_element("avtpsrc", ifname="lo", timeout=3.0)
        src.start()
    except (PermissionError, OSError):
        pytest.skip("AF_PACKET unavailable")
    sink = make_element("avtpsink", ifname="lo")
    sink.start()
    from gstreamer_tpu.net.avtp import build_aaf_pdu, parse_pdu
    pdu = build_aaf_pdu(7, 0x1234, 99, 48000, 2, b"\x01\x02\x03\x04")
    got = []

    def rx():
        for _ in range(10):
            b = src.create(1)
            if b and b.data:
                for p in b.data:
                    h = parse_pdu(bytes(p) if isinstance(
                        p, (bytes, bytearray)) else
                        np.asarray(p).tobytes())
                    if h["stream_id"] == 0x1234:
                        got.append(h)
                        return

    t = threading.Thread(target=rx)
    t.start()
    import time
    time.sleep(0.2)
    sink.render(Buffer(data=[pdu], batch=1))
    t.join(timeout=5)
    sink.stop()
    src.stop()
    assert got and got[0]["seq"] == 7
    assert got[0]["payload"] == b"\x01\x02\x03\x04"


def test_sctp_roundtrip():
    from gstreamer_tpu.net.sctp import crc32c, parse_packet
    # RFC 3720 CRC32c test vector: 32 bytes of zeros -> 0x8A9136AA
    assert crc32c(bytes(32)) == 0x8A9136AA
    enc = make_element("sctpenc")
    dec = make_element("sctpdec")
    dec.start()
    b = enc.host_aggregate({
        "sink_1": Buffer(data=np.frombuffer(b"hello", np.uint8),
                         batch=1, meta={"ppid": 51}),
        "sink_2": Buffer(data=np.frombuffer(b"world", np.uint8),
                         batch=1)})
    info = parse_packet(b.data[0])
    assert info["crc_ok"] and len(info["chunks"]) == 2
    out = dec.host_process(Buffer(data=list(b.data), batch=1))
    payloads = [bytes(np.asarray(x).tobytes()) for x in out.data]
    assert payloads == [b"hello", b"world"]
    assert out.meta["sctp_streams"] == [(1, 51), (2, 53)]
    assert len(dec.sacks) == 2


def test_sctp_reorder():
    from gstreamer_tpu.net.sctp import (build_data_chunk,
                                        build_packet)
    dec = make_element("sctpdec")
    dec.start()
    c0 = build_data_chunk(100, 0, 0, 53, b"first")
    c1 = build_data_chunk(101, 0, 1, 53, b"second")
    p1 = build_packet(5000, 5000, 1, [c1])     # out of order
    p0 = build_packet(5000, 5000, 1, [c0])
    # TSN 101 arrives first: held until 100 fills the gap... the
    # decoder anchors on the first seen TSN, so feed both packets
    out1 = dec.host_process(Buffer(data=[p1], batch=1))
    out2 = dec.host_process(Buffer(data=[p0], batch=1))
    got = []
    for o in (out1, out2):
        if o is not None:
            got += [bytes(np.asarray(x).tobytes()) for x in o.data]
    assert b"first" in got and b"second" in got


def test_vp8_matroska_roundtrip(tmp_path):
    vpx = pytest.importorskip("gstreamer_tpu.codecs.vpx")
    if not vpx.available():
        pytest.skip("libvpx missing")
    path = str(tmp_path / "v.mkv")
    p = parse_launch(
        "videotestsrc num-buffers=5 ! video/x-raw,format=I420,"
        "width=64,height=48,framerate=25/1 ! vp8enc ! "
        f"matroskamux location={path}")
    p.run()
    p.set_state("null")
    assert b"V_VP8" in open(path, "rb").read()
    q = parse_launch(f"matroskademux location={path} ! appsink name=o")
    q.run()
    sink = q.get_by_name("o")
    n = 0
    while True:
        s = sink.pull_sample()
        if s is None:
            break
        d = s.buffer.data
        y = np.asarray(d[0] if isinstance(d, (tuple, list)) else d)
        n += y.shape[0] if y.ndim == 3 else 1
    assert n == 5


def test_opusenc_stream(tmp_path):
    from gstreamer_tpu.codecs import opus as popus
    if not popus.available():
        pytest.skip("libopus missing")
    path = str(tmp_path / "dump.opus")
    p = parse_launch(
        "audiotestsrc num-buffers=10 ! audio/x-raw,format=S16LE,"
        "rate=48000,channels=2,layout=interleaved ! "
        f"opusenc location={path} ! avdec_opus ! appsink name=o")
    p.run()
    sink = p.get_by_name("o")
    tot = 0
    while True:
        s = sink.pull_sample()
        if s is None:
            break
        tot += np.asarray(s.buffer.data).shape[0]
    assert tot >= 10 * 1024              # ~10 buffers of audio
    blob = open(path, "rb").read()       # the optional Ogg dump
    assert blob[:4] == b"OggS" and b"OpusHead" in blob


def test_opus_matroska_roundtrip(tmp_path):
    from gstreamer_tpu.codecs import opus as popus
    if not popus.available():
        pytest.skip("libopus missing")
    path = str(tmp_path / "a.mkv")
    p = parse_launch(
        "audiotestsrc num-buffers=20 ! audio/x-raw,format=S16LE,"
        "rate=48000,channels=2,layout=interleaved ! opusenc ! "
        f"matroskamux location={path}")
    p.run()
    p.set_state("null")
    data = open(path, "rb").read()
    assert b"A_OPUS" in data and b"OpusHead" in data
    q = parse_launch(f"matroskademux location={path} stream=audio ! "
                     "appsink name=o")
    q.run()
    sink = q.get_by_name("o")
    tot = 0
    while True:
        s = sink.pull_sample()
        if s is None:
            break
        tot += np.asarray(s.buffer.data).shape[0]
    assert tot >= 20 * 1024


def test_avtp_rvf_roundtrip_lines_per_pdu():
    # 64x48 GRAY16: line = 128 B, fits the default mtu -> several
    # lines per PDU, ef on the last
    pay = make_element("avtprvfpay")
    pay._depth8 = False
    frame = (np.arange(48 * 64) % 60000).astype("<u2").reshape(48, 64)
    out = pay.host_process(Buffer(data=frame, batch=1, pts=0))
    from gstreamer_tpu.net.avtp import parse_rvf_pdu
    hs = [parse_rvf_pdu(p) for p in out.data]
    assert hs[0]["active_pixels"] == 64 and hs[0]["total_lines"] == 48
    assert not hs[0]["ef"] and hs[-1]["ef"]
    assert sum(h["num_lines"] for h in hs) == 48
    depay = make_element("avtprvfdepay")
    back = depay.host_process(Buffer(data=out.data, batch=1))
    got = np.asarray(back.data).reshape(48, 64)
    assert np.array_equal(got, frame)


def test_avtp_rvf_line_fragmentation():
    # mtu 96 -> room 64 < line_size 128: two fragments per line with
    # i_seq_num, eol fragment padded (gstavtprvfpay.c:209-221)
    pay = make_element("avtprvfpay", mtu=96)
    pay._depth8 = False
    frame = (np.arange(8 * 64) % 60000).astype("<u2").reshape(8, 64)
    out = pay.host_process(Buffer(data=frame, batch=1, pts=0))
    from gstreamer_tpu.net.avtp import parse_rvf_pdu
    hs = [parse_rvf_pdu(p) for p in out.data]
    assert len(hs) == 16                       # 2 fragments x 8 lines
    assert hs[0]["i_seq"] == 0 and hs[1]["i_seq"] == 1
    assert hs[1]["line_number"] == 1 and hs[2]["line_number"] == 2
    depay = make_element("avtprvfdepay")
    back = depay.host_process(Buffer(data=out.data, batch=1))
    got = np.asarray(back.data).reshape(8, 64)
    assert np.array_equal(got, frame)


def test_avtp_rvf_gray8():
    pay = make_element("avtprvfpay")
    pay._depth8 = True
    frame = (np.arange(16 * 32) % 251).astype(np.uint8).reshape(16, 32)
    out = pay.host_process(Buffer(data=frame, batch=1, pts=0))
    depay = make_element("avtprvfdepay")
    back = depay.host_process(Buffer(data=out.data, batch=1))
    assert np.array_equal(np.asarray(back.data).reshape(16, 32), frame)
