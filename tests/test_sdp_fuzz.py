"""SDP parse/serialize + fuzz tests for caps parsing and the audio
converter (the reference fuzzes gst-video-converter/gst-audio-converter/
gst-value under oss-fuzz, ci/fuzzing/)."""

import numpy as np
import pytest

from gstreamer_tpu.core.caps import Caps
from gstreamer_tpu.net.sdp import SDPMessage, media_to_caps

SDP = """v=0
o=- 123 1 IN IP4 127.0.0.1
s=Test Session
c=IN IP4 127.0.0.1
t=0 0
m=video 5004 RTP/AVP 96
a=rtpmap:96 RAW/90000
a=fmtp:96 sampling=RGB; width=64; height=48
m=audio 5006 RTP/AVP 97
a=rtpmap:97 L16/48000/2
"""


def test_sdp_parse():
    msg = SDPMessage.parse(SDP)
    assert msg.session_name == "Test Session"
    assert len(msg.medias) == 2
    v, a = msg.medias
    assert (v.media, v.port, v.formats) == ("video", 5004, ["96"])
    assert v.rtpmaps()[96] == ("RAW", 90000, 1)
    assert a.rtpmaps()[97] == ("L16", 48000, 2)
    caps = media_to_caps(a, 97)
    s = caps[0]
    assert s["encoding-name"] == "L16" and s["clock-rate"] == 48000


def test_sdp_roundtrip():
    msg = SDPMessage.parse(SDP)
    again = SDPMessage.parse(msg.as_text())
    assert again.session_name == msg.session_name
    assert [m.media for m in again.medias] == ["video", "audio"]
    assert again.medias[0].get_attribute_val("fmtp") == \
        msg.medias[0].get_attribute_val("fmtp")


# -- fuzzing -----------------------------------------------------------------

def test_caps_parse_fuzz():
    """Random garbage must never crash the caps parser (gst-value
    oss-fuzz target analog): it either parses or raises ValueError."""
    rng = np.random.default_rng(11)
    pieces = ["video/x-raw", "audio/x-raw", ",", "=", "(int)", "(string)",
              "[", "]", "{", "}", "width", "height", "rate", "1", "30",
              "/", "I420", ";", " ", "framerate", "(fraction)", "!",
              "foo", "2147483647", "-1", "true", "(boolean)"]
    for _ in range(300):
        n = rng.integers(1, 12)
        s = "".join(pieces[i] for i in rng.integers(0, len(pieces), n))
        try:
            c = Caps.from_string(s)
            # parsed caps must survive self-serialization
            Caps.from_string(str(c))
        except (ValueError, KeyError, IndexError):
            pass


def test_caps_intersect_fuzz():
    """Random structured caps pairs: intersect must be symmetric and a
    subset of both operands."""
    rng = np.random.default_rng(7)
    fmts = ["I420", "NV12", "RGB", "YUY2"]
    for _ in range(100):
        def rand_caps():
            f = fmts[rng.integers(0, len(fmts))]
            w1, w2 = sorted(rng.integers(1, 1000, 2).tolist())
            return Caps.from_string(
                f"video/x-raw, format={f}, width=[{w1},{w2 + 1}]")
        a, b = rand_caps(), rand_caps()
        i1 = a.intersect(b)
        i2 = b.intersect(a)
        assert i1.is_empty == i2.is_empty
        if not i1.is_empty:
            assert i1.is_subset(a) and i1.is_subset(b)


def test_audioconvert_fuzz():
    """Random format/channel configs through the audio converter: no
    crashes, output in range (gst-audio-converter oss-fuzz analog)."""
    from gstreamer_tpu.core.buffer import Buffer
    from gstreamer_tpu.core.parse import parse_launch
    from gstreamer_tpu.core.pipeline import State

    rng = np.random.default_rng(3)
    formats = ["S8", "U8", "S16LE", "S24_32LE", "S32LE", "F32LE", "F64LE"]
    dtypes = {"S8": np.int8, "U8": np.uint8, "S16LE": np.int16,
              "S24_32LE": np.int32, "S32LE": np.int32,
              "F32LE": np.float32, "F64LE": np.float64}
    for _ in range(12):
        inf = formats[rng.integers(0, len(formats))]
        outf = formats[rng.integers(0, len(formats))]
        ic = int(rng.integers(1, 5))
        oc = int(rng.integers(1, 5))
        n = int(rng.integers(16, 300))
        dt = dtypes[inf]
        if np.issubdtype(dt, np.floating):
            x = (rng.standard_normal((n, ic)) * 0.5).astype(dt)
        else:
            info = np.iinfo(dt)
            x = rng.integers(info.min, info.max, (n, ic)).astype(dt)
        p = parse_launch(
            f"appsrc name=in caps=audio/x-raw,format={inf},rate=48000,"
            f"channels={ic},layout=interleaved ! audioconvert ! "
            f"audio/x-raw,format={outf},channels={oc} ! appsink name=s")
        p.get_by_name("in").push_buffer(Buffer(data=x, pts=0, batch=1))
        p.set_state(State.PLAYING)
        assert p.tick(), (inf, outf, ic, oc)
        out = np.asarray(p.get_by_name("s").pull_sample().buffer.data)
        assert out.shape == (n, oc)
        if np.issubdtype(out.dtype, np.floating):
            assert np.isfinite(out).all()
