"""CEA-708 captions in SEI NALs: h264/h265 ccinserter/ccextractor
(gst-plugins-bad/gst/closedcaption/gsth264ccextractor.c family)."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.elements.cc_sei import (build_cc_sei_payload,
                                           parse_cc_sei_payload)
from gstreamer_tpu.native import av as native_av

needs_av = pytest.mark.skipif(not native_av.available(),
                              reason="libavcodec shim unavailable")


def test_t35_payload_roundtrip():
    cc = bytes([0xFC, 0x41, 0x42, 0xFD, 0x43, 0x44])
    payload = build_cc_sei_payload(cc)
    assert payload.startswith(b"\xb5\x00\x31GA94\x03")
    assert parse_cc_sei_payload(payload) == cc
    assert parse_cc_sei_payload(b"\x00" * 16) is None


def _aus(codec, opts, n=3):
    from gstreamer_tpu.native.av import AvVideoEncoder
    enc = AvVideoEncoder(codec, 64, 48, (30, 1), 300000, opts)
    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, (48, 64), np.uint8)
    u = np.full((24, 32), 128, np.uint8)
    out = []
    for i in range(n):
        y = np.clip(base.astype(int) + i, 0, 255).astype(np.uint8)
        out += [p for p, _ in enc.encode((y, u, u))]
    out += [p for p, _ in enc.flush()]
    return out


@needs_av
@pytest.mark.parametrize("h265", [False, True])
def test_insert_extract_roundtrip(h265):
    from gstreamer_tpu.elements.cc_sei import (H264CcExtractor,
                                               H264CcInserter,
                                               H265CcExtractor,
                                               H265CcInserter)
    if h265:
        aus = _aus("libx265", "preset=veryfast:tune=zerolatency:"
                   "x265-params=log-level=none")
        ins, ext = H265CcInserter(), H265CcExtractor()
    else:
        aus = _aus("libx264", "preset=veryfast:tune=zerolatency")
        ins, ext = H264CcInserter(), H264CcExtractor()
    cc = [bytes([0xFC, 0x41 + i, 0x42 + i]) for i in range(len(aus))]
    buf = Buffer(data=[np.frombuffer(a, np.uint8) for a in aus],
                 batch=len(aus),
                 meta={"closedcaption": ("cc_data", cc)})
    injected = ins.host_process(buf)
    got = ext.host_process(injected)
    assert got.meta["closedcaption"] == ("cc_data", cc)


@needs_av
def test_stream_with_sei_still_decodes():
    from gstreamer_tpu.elements.cc_sei import H264CcInserter
    from gstreamer_tpu.native.av import AvVideoDecoder
    aus = _aus("libx264", "preset=veryfast:tune=zerolatency")
    cc = [b"\xfc\x41\x42"] * len(aus)
    out = H264CcInserter().host_process(Buffer(
        data=[np.frombuffer(a, np.uint8) for a in aus],
        batch=len(aus), meta={"closedcaption": ("cc_data", cc)}))
    dec = AvVideoDecoder("h264")
    n = 0
    for b in (out.data if isinstance(out.data, list) else [out.data]):
        n += len(dec.decode(np.asarray(b).tobytes()))
    n += len(dec.flush())
    assert n == len(aus)


def test_extractor_passthrough_without_cc():
    from gstreamer_tpu.elements.cc_sei import H264CcExtractor
    buf = Buffer(data=np.frombuffer(
        b"\x00\x00\x00\x01\x65\x88\x80", np.uint8), batch=1)
    out = H264CcExtractor().host_process(buf)
    assert "closedcaption" not in (out.meta or {})
