"""RTP pay/depay batch 2 (reference gst-plugins-good/gst/rtp/,
gst/rtpmanager/): raw-audio profiles, H.265/H.263/H.261, RFC 2250
MPEG, RFC 3640 generic, AC-3, AMR, Xiph, RFC 4571 framing, RED and
ULPFEC."""

import struct

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.net.rtp import parse_rtp_header, rtp_header


def _run_roundtrip(caps, pay, depay, payload, extra_pay=""):
    p = parse_launch(
        f"appsrc name=in ! {caps} ! {pay} {extra_pay} ! {depay} ! "
        f"appsink name=out")
    p.get_by_name("in").push_buffer(Buffer(
        data=np.frombuffer(payload, np.uint8), pts=0))
    p.get_by_name("in").end_of_stream()
    p.run()
    out = bytearray()
    while (s := p.get_by_name("out").pull_sample()) is not None:
        d = s.buffer.data
        for b in (d if isinstance(d, (list, tuple)) else [d]):
            out += bytes(np.asarray(b).ravel())
    return bytes(out)


def _collect_packets(caps, pay, payload, extra_pay=""):
    p = parse_launch(
        f"appsrc name=in ! {caps} ! {pay} {extra_pay} ! "
        f"appsink name=out")
    p.get_by_name("in").push_buffer(Buffer(
        data=np.frombuffer(payload, np.uint8), pts=0))
    p.get_by_name("in").end_of_stream()
    p.run()
    pkts = []
    while (s := p.get_by_name("out").pull_sample()) is not None:
        d = s.buffer.data
        pkts.extend(bytes(np.asarray(b).ravel()) for b in
                    (d if isinstance(d, (list, tuple)) else [d]))
    return pkts


# no 00 00 sequences (emulation-safe for the NAL-based payloads)
_BODY = bytes(range(1, 251)) * 4


class TestRawAudioPairs:
    @pytest.mark.parametrize("caps,base,pt", [
        ("audio/G722,rate=8000,channels=1", "g722", 9),
        ("audio/G723,rate=8000,channels=1", "g723", 4),
        ("audio/x-adpcm,layout=g726", "g726", 96),
        ("audio/G729,rate=8000,channels=1", "g729", 18),
        ("audio/x-gsm,rate=8000,channels=1", "gsm", 3),
        ("audio/x-iLBC", "ilbc", 96),
        ("audio/x-speex", "speex", 96),
        ("audio/x-siren", "siren", 96),
        ("audio/x-bv", "bv", 96),
        ("meta/x-klv", "klv", 96),
        ("video/x-dv", "dv", 96),
        ("video/mpeg,mpegversion=4,systemstream=false", "mp4v", 96),
    ])
    def test_roundtrip_and_pt(self, caps, base, pt):
        got = _run_roundtrip(caps, f"rtp{base}pay", f"rtp{base}depay",
                             _BODY)
        assert got == _BODY
        pkt = _collect_packets(caps, f"rtp{base}pay", _BODY)[0]
        assert parse_rtp_header(pkt)["payload_type"] == pt

    def test_mtu_fragmentation_marker(self):
        pkts = _collect_packets("audio/x-gsm,rate=8000,channels=1",
                                "rtpgsmpay mtu=100", _BODY)
        assert len(pkts) > 1
        markers = [parse_rtp_header(p)["marker"] for p in pkts]
        assert markers[-1] and not any(markers[:-1])


class TestH265Rtp:
    def _stream(self, big=False):
        # synthetic HEVC NALs: 2-byte header (type<<1, layer/tid)
        vps = bytes([32 << 1, 1]) + _BODY[:20]
        sps = bytes([33 << 1, 1]) + _BODY[:30]
        idr = bytes([19 << 1, 1]) + (_BODY * (8 if big else 1))
        sc = b"\x00\x00\x00\x01"
        return sc + vps + sc + sps + sc + idr, [vps, sps, idr]

    def test_single_nal_roundtrip(self):
        au, nals = self._stream()
        got = _run_roundtrip(
            "video/x-h265,stream-format=byte-stream,alignment=au",
            "rtph265pay", "rtph265depay", au)
        for nal in nals:
            assert nal in got

    def test_fu_fragmentation(self):
        au, nals = self._stream(big=True)
        pkts = _collect_packets(
            "video/x-h265,stream-format=byte-stream,alignment=au",
            "rtph265pay mtu=200", au)
        fu_types = {(p[12] >> 1) & 0x3F for p in pkts}
        assert 49 in fu_types                    # FU used
        got = _run_roundtrip(
            "video/x-h265,stream-format=byte-stream,alignment=au",
            "rtph265pay mtu=200", "rtph265depay", au)
        for nal in nals:
            assert nal in got


class TestH263H261:
    def test_h263p_p_bit_restores_startcode(self):
        frame = b"\x00\x00\x80\x02" + _BODY[:100]
        got = _run_roundtrip("video/x-h263,variant=itu",
                             "rtph263ppay", "rtph263pdepay", frame)
        assert got == frame

    def test_h263_mode_a(self):
        frame = _BODY[:500]
        got = _run_roundtrip(
            "video/x-h263,variant=itu,h263version=h263",
            "rtph263pay", "rtph263depay", frame)
        assert got == frame
        pkt = _collect_packets(
            "video/x-h263,variant=itu,h263version=h263",
            "rtph263pay", frame)[0]
        assert parse_rtp_header(pkt)["payload_type"] == 34

    def test_h261(self):
        frame = _BODY[:300]
        got = _run_roundtrip("video/x-h261", "rtph261pay",
                             "rtph261depay", frame)
        assert got == frame
        pkt = _collect_packets("video/x-h261", "rtph261pay", frame)[0]
        assert parse_rtp_header(pkt)["payload_type"] == 31


class TestMpegRtp:
    def test_mpa_frag_offsets(self):
        frame = _BODY * 3
        pkts = _collect_packets("audio/mpeg,mpegversion=1",
                                "rtpmpapay mtu=200", frame)
        assert len(pkts) > 1
        offs = [struct.unpack(
            ">H", parse_rtp_header(p)["payload"][2:4])[0]
            for p in pkts]
        assert offs[0] == 0 and offs == sorted(offs)
        got = _run_roundtrip("audio/mpeg,mpegversion=1",
                             "rtpmpapay mtu=200", "rtpmpadepay",
                             frame)
        assert got == frame
        assert parse_rtp_header(pkts[0])["payload_type"] == 14

    def test_mpv(self):
        frame = _BODY * 2
        got = _run_roundtrip("video/mpeg,systemstream=false",
                             "rtpmpvpay mtu=300", "rtpmpvdepay",
                             frame)
        assert got == frame

    def test_mp2t_whole_ts_packets(self):
        ts = b"".join(bytes([0x47, 0x00, i, 0x10]) + bytes(184)
                      for i in range(12))
        pkts = _collect_packets("video/mpegts,systemstream=true",
                                "rtpmp2tpay mtu=800", ts)
        for p in pkts:
            assert len(parse_rtp_header(p)["payload"]) % 188 == 0
        got = _run_roundtrip("video/mpegts,systemstream=true",
                             "rtpmp2tpay mtu=800", "rtpmp2tdepay", ts)
        assert got == ts
        assert parse_rtp_header(pkts[0])["payload_type"] == 33

    def test_mp4g_au_headers(self):
        frame = _BODY[:700]
        pkts = _collect_packets(
            "audio/mpeg,mpegversion=4,stream-format=raw",
            "rtpmp4gpay", frame)
        payload = parse_rtp_header(pkts[0])["payload"]
        hbits, au0 = struct.unpack(">HH", payload[:4])
        assert hbits == 16 and (au0 >> 3) == len(frame)
        got = _run_roundtrip(
            "audio/mpeg,mpegversion=4,stream-format=raw",
            "rtpmp4gpay", "rtpmp4gdepay", frame)
        assert got == frame


class TestAc3Amr:
    def test_ac3_single(self):
        frame = _BODY[:600]
        pkts = _collect_packets("audio/x-ac3", "rtpac3pay", frame)
        payload = parse_rtp_header(pkts[0])["payload"]
        assert payload[0] == 0 and payload[1] == 1   # FT=0 NF=1
        got = _run_roundtrip("audio/x-ac3", "rtpac3pay",
                             "rtpac3depay", frame)
        assert got == frame

    def test_ac3_fragmented(self):
        frame = _BODY * 4
        got = _run_roundtrip("audio/x-ac3", "rtpac3pay mtu=256",
                             "rtpac3depay", frame)
        assert got == frame

    def test_amr_octet_aligned(self):
        frame = _BODY[:31]                       # 12.2 kbit mode size
        pkts = _collect_packets("audio/AMR", "rtpamrpay", frame)
        payload = parse_rtp_header(pkts[0])["payload"]
        assert payload[0] == 0xF0                # CMR: no request
        assert (payload[1] >> 3) & 0xF == 7      # FT for 31 bytes
        got = _run_roundtrip("audio/AMR", "rtpamrpay", "rtpamrdepay",
                             frame)
        assert got == frame


class TestXiph:
    @pytest.mark.parametrize("caps,base", [
        ("audio/x-vorbis", "vorbis"), ("video/x-theora", "theora")])
    def test_roundtrip(self, caps, base):
        frame = _BODY[:900]
        got = _run_roundtrip(caps, f"rtp{base}pay", f"rtp{base}depay",
                             frame)
        assert got == frame

    def test_fragmented(self):
        frame = _BODY * 4
        got = _run_roundtrip("audio/x-vorbis", "rtpvorbispay mtu=256",
                             "rtpvorbisdepay", frame)
        assert got == frame
        pkts = _collect_packets("audio/x-vorbis",
                                "rtpvorbispay mtu=256", frame)
        frags = [(struct.unpack(
            ">I", parse_rtp_header(p)["payload"][:4])[0] >> 6) & 0x3
            for p in pkts]
        assert frags[0] == 1 and frags[-1] == 3
        assert all(f == 2 for f in frags[1:-1])


class TestStreamFraming:
    def test_rfc4571_roundtrip(self):
        p = parse_launch(
            "appsrc name=in ! audio/x-gsm,rate=8000,channels=1 ! "
            "rtpgsmpay mtu=120 ! rtpstreampay ! rtpstreamdepay ! "
            "rtpgsmdepay ! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(_BODY, np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        out = bytearray()
        while (s := p.get_by_name("out").pull_sample()) is not None:
            d = s.buffer.data
            for b in (d if isinstance(d, (list, tuple)) else [d]):
                out += bytes(np.asarray(b).ravel())
        assert bytes(out) == _BODY

    def test_length_prefix(self):
        pkts = _collect_packets("audio/x-gsm,rate=8000,channels=1",
                                "rtpgsmpay ! rtpstreampay", _BODY)
        blob = pkts[0]
        ln = struct.unpack(">H", blob[:2])[0]
        inner = blob[2:2 + ln]
        assert parse_rtp_header(inner)["payload_type"] == 3


class TestGstPay:
    def test_caps_inline_and_roundtrip(self):
        frame = _BODY[:500]
        got = _run_roundtrip("application/x-custom", "rtpgstpay",
                             "rtpgstdepay", frame)
        assert got == frame
        pkts = _collect_packets("application/x-custom", "rtpgstpay",
                                frame)
        assert parse_rtp_header(pkts[0])["payload"][0] & 0x80


class TestPassthrough:
    def test_pt_rewrite(self):
        pkts = _collect_packets(
            "audio/x-gsm,rate=8000,channels=1",
            "rtpgsmpay ! rtppassthroughpay pt=111", _BODY[:100])
        assert parse_rtp_header(pkts[0])["payload_type"] == 111


def _media_packets(n, pt=96, ssrc=0xABCD):
    return [rtp_header(pt, 100 + i, 9000 + 160 * i, ssrc)
            + bytes([i]) * (20 + i) for i in range(n)]


class TestRed:
    def _push(self, element, pkts):
        p = parse_launch(
            f"appsrc name=in ! application/x-rtp ! {element} ! "
            f"appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(data=pkts, pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        out = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            d = s.buffer.data
            out.extend(bytes(np.asarray(b).ravel()) for b in
                       (d if isinstance(d, (list, tuple)) else [d]))
        return out

    def test_enc_dec_transparent(self):
        media = _media_packets(5)
        red = self._push("rtpredenc pt=122 distance=1", media)
        assert all(parse_rtp_header(r)["payload_type"] == 122
                   for r in red)
        back = self._push("rtpreddec pt=122", red)
        assert back == media

    def test_loss_recovery(self):
        media = _media_packets(5)
        red = self._push("rtpredenc pt=122 distance=1", media)
        lossy = red[:2] + red[3:]                # drop packet seq 102
        back = self._push("rtpreddec pt=122", lossy)
        seqs = [parse_rtp_header(b)["seq"] for b in back]
        assert 102 in seqs
        rec = back[seqs.index(102)]
        # payload recovered bit-exact from the redundant block
        assert parse_rtp_header(rec)["payload"] == \
            parse_rtp_header(media[2])["payload"]


class TestUlpFec:
    def _push(self, element, pkts):
        p = parse_launch(
            f"appsrc name=in ! application/x-rtp ! {element} ! "
            f"appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(data=pkts, pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        out = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            d = s.buffer.data
            out.extend(bytes(np.asarray(b).ravel()) for b in
                       (d if isinstance(d, (list, tuple)) else [d]))
        return out

    def test_fec_packets_emitted(self):
        media = _media_packets(8)
        out = self._push("rtpulpfecenc pt=122 group-size=4", media)
        fec = [p for p in out
               if parse_rtp_header(p)["payload_type"] == 122]
        assert len(fec) == 2

    def test_single_loss_recovered(self):
        media = _media_packets(4)
        out = self._push("rtpulpfecenc pt=122 group-size=4", media)
        lost = media[2]
        lossy = [p for p in out if p != lost]
        back = self._push("rtpulpfecdec pt=122", lossy)
        assert lost in back                      # bit-exact recovery

    def test_storage_passthrough(self):
        media = _media_packets(4)
        back = self._push("rtpstorage", media)
        assert back == media
