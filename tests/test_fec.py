"""SMPTE 2022-1 FEC (gstrtpst2022-1-fecenc.c / -fecdec.c): XOR row
FEC builds, single-loss recovery, end-to-end media survival."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.native import av as native_av
from gstreamer_tpu.net.fec import build_fec_packet, parse_fec_packet
from gstreamer_tpu.net.rtp import parse_rtp_header, rtp_header

needs_av = pytest.mark.skipif(not native_av.available(),
                              reason="libavcodec shim unavailable")


def _media(n=5, seq0=100):
    rng = np.random.default_rng(0)
    out = []
    for i in range(n):
        pay = bytes(rng.integers(0, 256, 40 + i * 7, np.uint8))
        out.append(rtp_header(96, seq0 + i, 9000 + i * 33, 0x1234,
                              marker=(i == n - 1)) + pay)
    return out


def test_fec_packet_fields():
    media = _media()
    fec = parse_fec_packet(build_fec_packet(media, 100, 0, 0xFEC0))
    assert fec["sn_base"] == 100
    assert fec["na"] == 5 and fec["offset"] == 1


@pytest.mark.parametrize("lost", [0, 2, 4])
def test_single_loss_recovery(lost):
    from gstreamer_tpu.net.fec import RtpSt2022FecDec
    media = _media()
    fec = build_fec_packet(media, 100, 0, 0xFEC0)
    dec = RtpSt2022FecDec()
    dec.start()
    keep = [m for k, m in enumerate(media) if k != lost] + [fec]
    out = dec.host_process(Buffer(
        data=[np.frombuffer(m, np.uint8) for m in keep],
        batch=len(keep)))
    pkts = [bytes(np.asarray(x).tobytes()) for x in out.data]
    assert len(pkts) == 5 and dec.recovered == 1
    rec = [p for p in pkts
           if parse_rtp_header(p)["seq"] == 100 + lost][0]
    want = parse_rtp_header(media[lost])
    got = parse_rtp_header(rec)
    assert got["payload"] == want["payload"]
    assert got["timestamp"] == want["timestamp"]
    assert got["payload_type"] == want["payload_type"]


def test_no_loss_passthrough():
    from gstreamer_tpu.net.fec import RtpSt2022FecDec
    media = _media()
    fec = build_fec_packet(media, 100, 0, 0xFEC0)
    dec = RtpSt2022FecDec()
    dec.start()
    out = dec.host_process(Buffer(
        data=[np.frombuffer(m, np.uint8) for m in media + [fec]],
        batch=6))
    assert len(out.data) == 5 and dec.recovered == 0


@needs_av
def test_end_to_end_vp8_with_loss():
    """vp8 ! rtpvp8pay ! fecenc -> drop one media packet -> fecdec !
    rtpvp8depay ! avdec_vp8: every frame must survive."""
    p = parse_launch(
        "videotestsrc num-buffers=4 pattern=gradient ! "
        "video/x-raw,format=I420,width=64,height=48,framerate=30/1 ! "
        "avenc_vp8 ! rtpvp8pay mtu=200 ! "
        "rtpst2022_1_fecenc rows=4 ! appsink name=out")
    p.run()
    sink = p.get_by_name("out")
    pkts = []
    while (s := sink.pull_sample()) is not None:
        d = s.buffer.data
        pkts.extend(d if isinstance(d, list) else [d])
    pkts = [(bytes(x) if isinstance(x, (bytes, bytearray))
             else np.asarray(x).tobytes()) for x in pkts]
    media_idx = [i for i, pk in enumerate(pkts)
                 if parse_rtp_header(pk)["payload_type"] != 100]
    assert len(media_idx) >= 4
    dropped = pkts[:media_idx[1]] + pkts[media_idx[1] + 1:]
    d = parse_launch("appsrc name=in ! application/x-rtp ! "
                     "rtpst2022_1_fecdec ! rtpvp8depay ! avdec_vp8 ! "
                     "appsink name=out")
    d.get_by_name("in").push_buffer(Buffer(
        data=[np.frombuffer(x, np.uint8) for x in dropped],
        batch=len(dropped)))
    d.get_by_name("in").end_of_stream()
    d.run()
    sink = d.get_by_name("out")
    n = 0
    while (s := sink.pull_sample()) is not None:
        n += np.asarray(s.buffer.data[0]).shape[0]
    assert n == 4
