"""SDP library, sdpdemux/sdpsrc, rtpsrc/rtpsink
(gst-libs/gst/sdp/gstsdpmessage.c, gst-plugins-bad/gst/sdp/,
gst-plugins-bad/gst/rtp/gstrtpsrc.c)."""

import threading
import time

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.net.sdp import SDPMessage

SDP_TEXT = """v=0
o=- 123 1 IN IP4 127.0.0.1
s=Session
c=IN IP4 127.0.0.1
t=0 0
m=audio 0 RTP/AVP 0
a=rtpmap:0 PCMU/8000
m=video 0 RTP/AVP 96
a=rtpmap:96 H264/90000
a=fmtp:96 packetization-mode=1
"""


class TestSdpMessage:
    def test_parse(self):
        msg = SDPMessage.parse(SDP_TEXT)
        assert msg.session_name == "Session"
        assert [m.media for m in msg.medias] == ["audio", "video"]
        assert msg.medias[0].formats == ["0"]
        name, rate, ch = msg.medias[0].rtpmaps()[0]
        assert name == "PCMU" and rate == 8000

    def test_media_caps(self):
        from gstreamer_tpu.net.sdp import media_to_caps
        msg = SDPMessage.parse(SDP_TEXT)
        c = media_to_caps(msg.medias[1], 96)[0]
        assert c.name == "application/x-rtp"
        assert c["media"] == "video"
        assert c["encoding-name"] == "H264"
        assert c["payload"] == 96

    def test_serialize_roundtrip(self):
        msg = SDPMessage.parse(SDP_TEXT)
        again = SDPMessage.parse(msg.as_text())
        assert [m.media for m in again.medias] == ["audio", "video"]
        assert again.medias[1].get_attribute_val("fmtp") == \
            "96 packetization-mode=1"


class TestRtpUriElements:
    def test_rtpsink_to_rtpsrc(self):
        import socket
        # find a free port
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()

        recv = parse_launch(
            f"rtpsrc uri=rtp://127.0.0.1:{port}?media=audio "
            f"timeout=2.0 num-buffers=4 ! appsink name=out")
        got = []

        def run_recv():
            recv.run()
            while (smp := recv.get_by_name("out")
                   .pull_sample()) is not None:
                d = smp.buffer.data
                for b in (d if isinstance(d, (list, tuple)) else [d]):
                    got.append(np.asarray(b).tobytes())

        t = threading.Thread(target=run_recv)
        t.start()
        time.sleep(0.3)
        send = parse_launch(
            f"audiotestsrc num-buffers=4 samplesperbuffer=160 ! "
            f"audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            f"mulawenc ! rtppcmupay ! rtpsink "
            f"uri=rtp://127.0.0.1:{port}")
        send.run()
        send.set_state("null")
        t.join(timeout=10)
        assert len(got) == 4
        from gstreamer_tpu.net.rtp import parse_rtp_header
        assert parse_rtp_header(got[0])["payload_type"] == 0

    def test_rtpsrc_uri_caps(self):
        from gstreamer_tpu.core.element import element_factory_make
        e = element_factory_make(
            "rtpsrc",
            uri="rtp://0.0.0.0:5004?media=audio&clock-rate=8000")
        c = e.get_caps()[0]
        assert c["media"] == "audio" and c["clock-rate"] == 8000


class TestSdpDemux:
    def test_receive_via_sdp(self, tmp_path):
        import socket
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        sdp = SDP_TEXT.replace("m=audio 0", f"m=audio {port}")
        (tmp_path / "s.sdp").write_text(sdp)

        recv = parse_launch(
            f"sdpdemux location={tmp_path}/s.sdp media=audio "
            f"timeout=2.0 num-buffers=2 ! appsink name=out")
        got = []

        def run_recv():
            recv.run()
            while (smp := recv.get_by_name("out")
                   .pull_sample()) is not None:
                got.append(smp)

        t = threading.Thread(target=run_recv)
        t.start()
        time.sleep(0.3)
        send = parse_launch(
            f"audiotestsrc num-buffers=2 samplesperbuffer=160 ! "
            f"audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            f"mulawenc ! rtppcmupay ! udpsink host=127.0.0.1 "
            f"port={port}")
        send.run()
        send.set_state("null")
        t.join(timeout=10)
        assert len(got) == 2
        caps = got[0].caps[0]
        assert caps["encoding-name"] == "PCMU"
        assert caps["clock-rate"] == 8000
