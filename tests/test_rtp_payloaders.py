"""RTP codec payloaders, RTP demuxers, DTMF-over-RTP (reference
gst-plugins-good/gst/rtp/, gst/rtpmanager/, gst/dtmf/)."""

import struct

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.net.rtp import parse_rtp_header, rtp_header


def _h264_stream(n=3):
    from tests.test_videoparsers import SC, make_slice, make_sps
    sps = make_sps(8, 6)
    slices = [make_slice(0, idr=(k == 0)) for k in range(n)]
    return sps, slices, b"".join(SC + sps + SC + s for s in slices)


class TestLawPayloaders:
    @pytest.mark.parametrize("enc,pay,depay,dec,pt", [
        ("mulawenc", "rtppcmupay", "rtppcmudepay", "mulawdec", 0),
        ("alawenc", "rtppcmapay", "rtppcmadepay", "alawdec", 8)])
    def test_roundtrip_bit_exact(self, enc, pay, depay, dec, pt):
        gold = parse_launch(
            f"audiotestsrc num-buffers=3 samplesperbuffer=700 ! "
            f"audio/x-raw,format=S16LE,rate=8000,channels=1 ! {enc} "
            f"! appsink name=out")
        gold.run()
        want = []
        while (s := gold.get_by_name("out").pull_sample()) is not None:
            want.append(np.asarray(s.buffer.data).ravel())
        want = np.concatenate(want)

        p = parse_launch(
            f"audiotestsrc num-buffers=3 samplesperbuffer=700 ! "
            f"audio/x-raw,format=S16LE,rate=8000,channels=1 ! {enc} "
            f"! {pay} ! {depay} ! appsink name=out")
        p.run()
        got = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            got.append(np.asarray(s.buffer.data).ravel())
        np.testing.assert_array_equal(np.concatenate(got), want)

    def test_static_payload_type(self):
        p = parse_launch(
            "audiotestsrc num-buffers=1 samplesperbuffer=100 ! "
            "audio/x-raw,format=S16LE,rate=8000,channels=1 ! alawenc "
            "! rtppcmapay ! appsink name=out")
        p.run()
        s = p.get_by_name("out").pull_sample()
        pkt = bytes(s.buffer.data[0])
        assert parse_rtp_header(pkt)["payload_type"] == 8


class TestH264Rtp:
    def test_fua_fragmentation(self):
        from tests.test_videoparsers import SC, make_slice, make_sps
        sps = make_sps(8, 6)
        # pad slices past the MTU so FU-A kicks in (emulation-safe
        # filler: no 00 00 0x sequences)
        slices = [make_slice(0, idr=(k == 0)) + bytes([0x40 + k]) * 200
                  for k in range(3)]
        stream = b"".join(SC + sps + SC + s for s in slices)
        p = parse_launch(
            "appsrc name=in ! application/octet-stream ! h264parse ! "
            "rtph264pay mtu=64 ! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(stream, np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        pkts = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            d = s.buffer.data
            pkts.extend(bytes(x) for x in
                        (d if isinstance(d, (list, tuple)) else [d]))
        types = {parse_rtp_header(pkt)["payload"][0] & 0x1F
                 for pkt in pkts}
        assert 28 in types                       # FU-A used
        assert all(len(pkt) <= 64 for pkt in pkts)
        # markers end each AU: 3 AUs -> 3 marker packets
        assert sum(parse_rtp_header(p2)["marker"] for p2 in pkts) == 3

    def test_roundtrip(self):
        sps, slices, stream = _h264_stream(4)
        p = parse_launch(
            "appsrc name=in ! application/octet-stream ! h264parse ! "
            "rtph264pay mtu=80 ! rtph264depay ! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(stream, np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        raw = b""
        caps = None
        while (s := p.get_by_name("out").pull_sample()) is not None:
            caps = s.caps
            d = s.buffer.data
            for b in (d if isinstance(d, (list, tuple)) else [d]):
                raw += np.asarray(b).tobytes()
        assert caps[0].name == "video/x-h264"
        assert sps in raw
        for sl in slices:
            assert sl in raw

    def test_stapa_depay(self):
        # STAP-A aggregate of two NALs
        n1 = bytes([0x67, 1, 2, 3])
        n2 = bytes([0x65, 9, 9])
        stap = bytes([24]) + struct.pack(">H", len(n1)) + n1 \
            + struct.pack(">H", len(n2)) + n2
        pkt = rtp_header(96, 0, 0, 1, marker=True) + stap
        p = parse_launch("appsrc name=in ! application/x-rtp ! "
                         "rtph264depay ! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(data=[pkt], pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        raw = np.asarray(s.buffer.data).tobytes()
        assert raw == b"\x00\x00\x00\x01" + n1 + b"\x00\x00\x00\x01" + n2


class TestRtpDemux:
    def _mk(self, pt, ssrc, seq):
        return rtp_header(pt, seq, 0, ssrc) + bytes([seq])

    def test_ptdemux_routes(self):
        pkts = [self._mk(96, 1, 0), self._mk(97, 1, 1),
                self._mk(96, 1, 2)]
        p = parse_launch(
            "appsrc name=in ! application/x-rtp ! rtpptdemux name=d "
            "d.src_0 ! appsink name=a d.src_1 ! appsink name=b")
        p.get_by_name("in").push_buffer(Buffer(data=pkts, pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        a = p.get_by_name("a").pull_sample()
        b = p.get_by_name("b").pull_sample()
        apts = [parse_rtp_header(bytes(x))["payload_type"]
                for x in a.buffer.data]
        bpts = [parse_rtp_header(bytes(x))["payload_type"]
                for x in b.buffer.data]
        assert apts == [96, 96] and bpts == [97]

    def test_ssrcdemux_routes(self):
        pkts = [self._mk(96, 111, 0), self._mk(96, 222, 1)]
        p = parse_launch(
            "appsrc name=in ! application/x-rtp ! rtpssrcdemux name=d "
            "d.src_0 ! appsink name=a d.src_1 ! appsink name=b")
        p.get_by_name("in").push_buffer(Buffer(data=pkts, pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        a = p.get_by_name("a").pull_sample()
        b = p.get_by_name("b").pull_sample()
        assert parse_rtp_header(bytes(a.buffer.data[0]))["ssrc"] == 111
        assert parse_rtp_header(bytes(b.buffer.data[0]))["ssrc"] == 222


class TestDtmfRtp:
    def test_event_packets(self):
        p = parse_launch("rtpdtmfsrc tones=5 tone-duration=100 "
                         "packet-interval=20 ! appsink name=out")
        p.run()
        pkts = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            d = s.buffer.data
            pkts.extend(bytes(x) for x in
                        (d if isinstance(d, (list, tuple)) else [d]))
        # 4 interval packets (20,40,60,80ms) + 3 end retransmits
        assert len(pkts) == 7
        ev, b1, dur = struct.unpack("!BBH",
                                    parse_rtp_header(pkts[0])["payload"])
        assert ev == 5 and not (b1 & 0x80)
        ends = [parse_rtp_header(pk)["payload"][1] & 0x80 for pk in pkts]
        assert ends.count(0x80) == 3
        # timestamp frozen across the event
        tss = {parse_rtp_header(pk)["timestamp"] for pk in pkts}
        assert len(tss) == 1
        # first packet has the marker
        assert parse_rtp_header(pkts[0])["marker"]
        assert not parse_rtp_header(pkts[1])["marker"]

    def test_depay_matches_dtmfsrc_tone(self):
        p = parse_launch("rtpdtmfsrc tones=7 tone-duration=150 ! "
                         "rtpdtmfdepay ! appsink name=out")
        p.run()
        got = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            got.append(np.asarray(s.buffer.data).ravel())
        got = np.concatenate(got)
        from gstreamer_tpu.elements.dtmf_icy import generate_dtmf
        want = generate_dtmf("7", 150 * 8, 8000, 0)
        np.testing.assert_array_equal(got, want)


class TestJpegRtp:
    def _encode(self, w=64, h=48, n=2):
        p = parse_launch(
            f"videotestsrc num-buffers={n} pattern=smpte ! "
            f"video/x-raw,format=I420,width={w},height={h} ! jpegenc "
            f"! appsink name=out")
        p.run()
        out = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            d = s.buffer.data
            for b in (d if isinstance(d, (list, tuple)) else [d]):
                out.append(np.asarray(b).tobytes())
        return out

    def test_fragmentation_and_marker(self):
        imgs = self._encode(n=1)
        p = parse_launch("appsrc name=in ! image/jpeg ! rtpjpegpay "
                         "mtu=200 ! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(imgs[0], np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        pkts = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            d = s.buffer.data
            pkts.extend(bytes(x) for x in
                        (d if isinstance(d, (list, tuple)) else [d]))
        assert len(pkts) > 3
        assert all(len(pk) <= 200 for pk in pkts)
        markers = [parse_rtp_header(pk)["marker"] for pk in pkts]
        assert markers[-1] and not any(markers[:-1])
        # main header fields (RFC 2435 3.1): offset 0 on first packet,
        # dims in 8-pixel units, q=255 -> in-band tables
        h0 = parse_rtp_header(pkts[0])["payload"]
        assert int.from_bytes(h0[1:4], "big") == 0
        assert h0[5] == 255 and h0[6] == 8 and h0[7] == 6
        # continuation offsets increase
        offs = [int.from_bytes(parse_rtp_header(pk)["payload"][1:4],
                               "big") for pk in pkts]
        assert offs == sorted(offs)

    def test_roundtrip_decodes_identically(self):
        from gstreamer_tpu.codecs.jpeg import jpeg_decode
        imgs = self._encode(n=2)
        p = parse_launch("appsrc name=in ! image/jpeg ! rtpjpegpay "
                         "mtu=300 ! rtpjpegdepay ! appsink name=out")
        for img in imgs:
            p.get_by_name("in").push_buffer(Buffer(
                data=np.frombuffer(img, np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        back = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            d = s.buffer.data
            for b in (d if isinstance(d, (list, tuple)) else [d]):
                back.append(np.asarray(b).tobytes())
        assert len(back) == len(imgs)
        for o, r in zip(imgs, back):
            assert r.startswith(b"\xff\xd8") and r.endswith(b"\xff\xd9")
            do, dr = jpeg_decode(o), jpeg_decode(r)
            for pa, pb in zip(do[0] if isinstance(do, tuple) else do,
                              dr[0] if isinstance(dr, tuple) else dr):
                np.testing.assert_array_equal(np.asarray(pa),
                                              np.asarray(pb))

    def test_make_tables_rfc_scaling(self):
        from gstreamer_tpu.net.rtp_payloaders import (
            _JPEG_LUMA_Q, _ZIGZAG, rfc2435_make_tables)
        t50 = rfc2435_make_tables(50)           # scale 100 = identity
        assert t50[0] == _JPEG_LUMA_Q[_ZIGZAG[0]]
        t1 = rfc2435_make_tables(1)             # max coarseness, clamp
        assert max(t1) == 255
        t99 = rfc2435_make_tables(99)           # near-lossless, min 1
        assert min(t99) >= 1


class TestRtpMux:
    def _pkts(self, pipeline_tail="rtpmux", launch_extra=""):
        p = parse_launch(
            f"audiotestsrc num-buffers=3 samplesperbuffer=400 ! "
            f"audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            f"mulawenc ! rtppcmupay ! {pipeline_tail} {launch_extra} "
            f"! appsink name=out")
        p.run()
        pkts = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            d = s.buffer.data
            pkts.extend(bytes(x) for x in
                        (d if isinstance(d, (list, tuple)) else [d]))
        return pkts

    def test_common_series(self):
        pkts = self._pkts("rtpmux", "ssrc=4242 seqnum-offset=100")
        seqs = [parse_rtp_header(pk)["seq"] for pk in pkts]
        ssrcs = {parse_rtp_header(pk)["ssrc"] for pk in pkts}
        assert seqs == list(range(100, 100 + len(pkts)))
        assert ssrcs == {4242}

    def test_funnel_keeps_ssrc(self):
        pkts = self._pkts("rtpfunnel")
        ssrcs = {parse_rtp_header(pk)["ssrc"] for pk in pkts}
        assert ssrcs == {0x1234}                 # pay default kept

    def test_dtmfmux_exists(self):
        pkts = self._pkts("rtpdtmfmux")
        assert pkts


class TestRtpRtx:
    def test_send_receive_cycle(self):
        from gstreamer_tpu.core.element import element_factory_make
        send = element_factory_make("rtprtxsend", **{
            "rtx-payload-type": 97})
        recv = element_factory_make("rtprtxreceive", **{
            "rtx-payload-type": 97, "orig-payload-type": 0})
        send.start()
        recv.start()
        orig = [rtp_header(0, k, 1000 + k, 777) + bytes([k]) * 10
                for k in range(5)]
        out1 = send.host_process(Buffer(data=list(orig), pts=0))
        assert [bytes(x) for x in out1.data] == orig
        # request retransmission of seq 2
        assert send.request_retransmit(2)
        out2 = send.host_process(Buffer(data=[], pts=0))
        rtx = [bytes(x) for x in out2.data]
        assert len(rtx) == 1
        h = parse_rtp_header(rtx[0])
        assert h["payload_type"] == 97
        assert struct.unpack("!H", h["payload"][:2])[0] == 2
        # receive side: restore original packets
        restored = recv.host_process(Buffer(data=list(orig) + rtx,
                                            pts=0))
        got = [bytes(x) for x in restored.data]
        assert len(got) == 6
        hr = parse_rtp_header(got[5])
        assert hr["seq"] == 2 and hr["payload_type"] == 0
        assert hr["ssrc"] == 777                 # learned
        assert hr["payload"] == bytes([2]) * 10
        assert recv.num_rtx_packets == 1

    def test_send_history_bound(self):
        from gstreamer_tpu.core.element import element_factory_make
        send = element_factory_make("rtprtxsend", **{
            "max-size-packets": 3})
        send.start()
        pkts = [rtp_header(0, k, 0, 1) + b"x" for k in range(10)]
        send.host_process(Buffer(data=pkts, pts=0))
        assert not send.request_retransmit(2)    # evicted
        assert send.request_retransmit(9)

    def test_rtxqueue_resends_original(self):
        from gstreamer_tpu.core.element import element_factory_make
        q = element_factory_make("rtprtxqueue")
        q.start()
        pkts = [rtp_header(0, k, 0, 5) + bytes([k]) for k in range(3)]
        q.host_process(Buffer(data=pkts, pts=0))
        assert q.request_retransmit(1)
        out = q.host_process(Buffer(data=[], pts=0))
        assert bytes(out.data[0]) == pkts[1]     # verbatim resend
