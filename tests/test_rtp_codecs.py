"""VP8/VP9/Opus RTP payloaders (gst-plugins-good/gst/rtp/
gstrtpvp8pay.c RFC 7741, gstrtpvp9pay.c, gstrtpopuspay.c RFC 7587)
with the packet-stream codec transforms (avenc_vp8/avenc_opus...)."""

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.native import av as native_av

needs_av = pytest.mark.skipif(not native_av.available(),
                              reason="libavcodec shim unavailable")

SRC = ("videotestsrc num-buffers=4 pattern=gradient ! "
       "video/x-raw,format=I420,width=64,height=48,framerate=30/1 ! ")


def _pull_video(p, sink_name="out"):
    sink = p.get_by_name(sink_name)
    frames = []
    while True:
        s = sink.pull_sample()
        if s is None:
            break
        d = [np.asarray(x) for x in s.buffer.data]
        for k in range(d[0].shape[0]):
            frames.append(tuple(x[k] for x in d))
    return frames


@needs_av
@pytest.mark.parametrize("codec", ["vp8", "vp9"])
def test_vpx_rtp_roundtrip_fragmented(codec):
    """Small MTU forces multi-packet frames: descriptor fragmentation
    and marker-terminated reassembly must reconstruct every frame."""
    p = parse_launch(
        SRC + f"avenc_{codec} ! rtp{codec}pay mtu=200 ! "
        f"rtp{codec}depay ! avdec_{codec} ! appsink name=out")
    p.run()
    frames = _pull_video(p)
    assert len(frames) == 4
    assert frames[0][0].shape == (48, 64)
    # gold: direct enc->dec without RTP must match bit-exactly
    g = parse_launch(
        SRC + f"avenc_{codec} ! avdec_{codec} ! appsink name=out")
    g.run()
    gold = _pull_video(g)
    for a, b in zip(gold, frames):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


@needs_av
def test_opus_rtp_roundtrip():
    p = parse_launch(
        "audiotestsrc num-buffers=4 samplesperbuffer=4096 ! "
        "audio/x-raw,rate=48000,channels=2,format=S16LE ! "
        "avenc_opus ! rtpopuspay ! rtpopusdepay ! avdec_opus ! "
        "appsink name=out")
    p.run()
    sink = p.get_by_name("out")
    chunks = []
    while (s := sink.pull_sample()) is not None:
        chunks.append(np.asarray(s.buffer.data))
    pcm = np.concatenate(chunks)
    assert pcm.shape[0] > 15000 and pcm.shape[1] == 2
    spec = np.abs(np.fft.rfft(pcm[2048:2048 + 8192, 0]))
    assert spec.max() > 20 * np.median(spec + 1e-12)


@needs_av
def test_vp8_descriptor_bits():
    """First fragment carries S=1; continuation fragments S=0
    (RFC 7741 §4.2)."""
    from gstreamer_tpu.net.rtp import parse_rtp_header
    p = parse_launch(SRC + "avenc_vp8 ! rtpvp8pay mtu=60 ! "
                     "appsink name=out")
    p.run()
    sink = p.get_by_name("out")
    pkts = []
    while (s := sink.pull_sample()) is not None:
        d = s.buffer.data
        pkts.extend(d if isinstance(d, list) else [d])
    pkts = [bytes(np.asarray(x).tobytes()
                  if not isinstance(x, (bytes, bytearray)) else x)
            for x in pkts]
    assert len(pkts) > 4                # fragmentation happened
    starts = 0
    for pkt in pkts:
        h = parse_rtp_header(pkt)
        if h["payload"][0] & 0x10:
            starts += 1
    assert starts == 4                  # one S bit per frame
