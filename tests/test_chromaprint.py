"""chromaprint (gst-plugins-bad/ext/chromaprint): AcoustID
fingerprinting over the system libchromaprint."""

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements import chromaprint as cp_mod

pytestmark = pytest.mark.skipif(cp_mod._LIB is None,
                                reason="libchromaprint not available")


def _run(extra="", seconds=8):
    nbuf = seconds * 10
    p = parse_launch(
        f"audiotestsrc num-buffers={nbuf} samplesperbuffer=4410 "
        "wave=ticks volume=0.6 ! "
        "audio/x-raw,format=S16LE,rate=44100,channels=1 ! "
        f"chromaprint name=cp {extra} ! fakesink")
    p.run()
    return p


class TestChromaprint:
    def test_fingerprint_tag_at_eos(self):
        p = _run()
        msgs = [m for m in iter(lambda: p.bus.pop(), None)
                if m.type == "tag"]
        fps = [m.data.get("chromaprint-fingerprint")
               for m in msgs if "chromaprint-fingerprint" in m.data]
        assert fps and fps[0]
        # AcoustID compressed fingerprints are base64url text
        assert all(c.isalnum() or c in "-_=" for c in fps[0])
        assert len(fps[0]) > 20
        assert p.get_by_name("cp").props["fingerprint"] == fps[0]

    def test_deterministic(self):
        a = _run().get_by_name("cp").props["fingerprint"]
        b = _run().get_by_name("cp").props["fingerprint"]
        assert a == b

    def test_short_stream_no_fingerprint(self):
        # <= 3 s of audio -> no fingerprint (gstchromaprint.c:142)
        p = _run(seconds=2)
        assert p.get_by_name("cp").props["fingerprint"] == ""

    def test_duration_property_limits(self):
        p = _run("duration=5", seconds=9)
        fp = p.get_by_name("cp").props["fingerprint"]
        assert fp
