"""insertbin, testsrcbin, rtponviftimestamp/parse, face detector
decoder (gst-plugins-bad insertbin/debugutils/onvif/
tensordecoders)."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.caps import Caps
from gstreamer_tpu.core.element import element_factory_make
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.bad_bins import (onvif_extension,
                                             parse_onvif_extension)


class TestInsertBin:
    def test_chain_applies_in_order(self):
        ib = element_factory_make("insertbin")
        ib.append("volume")
        ib._chain[0].props["volume"] = 0.5
        ib.append("volume")
        ib._chain[1].props["volume"] = 0.5
        caps = Caps.from_string(
            "audio/x-raw, format=F32LE, rate=8000, channels=1, "
            "layout=interleaved")
        ib.set_info(caps, caps)
        x = np.ones((100, 1), np.float32)
        out = ib.host_process(Buffer(data=x, pts=0))
        np.testing.assert_allclose(np.asarray(out.data), x * 0.25,
                                   rtol=1e-6)

    def test_remove(self):
        ib = element_factory_make("insertbin")
        ib.append("volume")
        v = ib._chain[0]
        ib.remove(v)
        assert ib._chain == []

    def test_empty_passthrough(self):
        ib = element_factory_make("insertbin")
        caps = Caps.from_string(
            "audio/x-raw, format=F32LE, rate=8000, channels=1, "
            "layout=interleaved")
        ib.set_info(caps, caps)
        x = np.ones((10, 1), np.float32)
        out = ib.host_process(Buffer(data=x, pts=0))
        np.testing.assert_array_equal(np.asarray(out.data), x)


class TestTestSrcBin:
    def test_video_branch(self):
        p = parse_launch(
            "testsrcbin stream=video num-buffers=2 ! "
            "video/x-raw,format=RGB,width=16,height=16 ! appsink "
            "name=out")
        p.run()
        assert p.get_by_name("out").pull_sample() is not None

    def test_audio_branch(self):
        p = parse_launch(
            "testsrcbin stream=audio num-buffers=2 ! "
            "audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            "appsink name=out")
        p.run()
        s = p.get_by_name("out").pull_sample()
        assert np.asarray(s.buffer.data).dtype == np.int16


class TestOnvif:
    def test_extension_roundtrip(self):
        ext = onvif_extension(0x0102030405060708, cseq=9, c=True,
                              d=True)
        info = parse_onvif_extension(ext)
        assert info["ntp"] == 0x0102030405060708
        assert info["c"] and info["d"] and not info["e"]
        assert info["cseq"] == 9

    def test_pipeline_chain(self):
        p = parse_launch(
            "audiotestsrc num-buffers=2 samplesperbuffer=160 ! "
            "audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            "mulawenc ! rtppcmupay ! rtponviftimestamp "
            "ntp-offset=1000000000 ! rtponvifparse ! rtppcmudepay ! "
            "mulawdec ! appsink name=out")
        p.run()
        total = 0
        while (s := p.get_by_name("out").pull_sample()) is not None:
            total += np.asarray(s.buffer.data).shape[0]
        assert total == 320

    def test_timestamp_recovered(self):
        from gstreamer_tpu.net.rtp import rtp_header
        ts = element_factory_make("rtponviftimestamp")
        pr = element_factory_make("rtponvifparse")
        pkt = rtp_header(0, 0, 0, 1) + b"payload"
        out = ts.host_process(Buffer(data=[pkt], pts=2_000_000_000))
        stamped = bytes(out.data[0])
        assert stamped[0] & 0x10                 # X bit set
        back = pr.host_process(out)
        assert (back.meta or {}).get("onvif-ntp") == (2 << 32)
        assert bytes(back.data[0]) == pkt


class TestFaceDetector:
    def test_decodes_faces(self):
        from gstreamer_tpu.analytics import (ObjectDetectionMtd,
                                             Tensor,
                                             get_relation_meta,
                                             relation_meta_of)
        buf = Buffer(data=np.zeros(4), pts=0, batch=1)
        rm = get_relation_meta(buf, 0, create=True)
        rm.add_tensor_mtd(Tensor(
            id="boxes", data=np.array([[0.1, 0.1, 0.4, 0.3],
                                       [0.5, 0.5, 0.6, 0.6]])))
        rm.add_tensor_mtd(Tensor(id="scores",
                                 data=np.array([0.9, 0.2])))
        dec = element_factory_make("facedetectortensordecoder")
        out = dec.host_process(buf)
        ods = relation_meta_of(out)[0].iter_mtds(ObjectDetectionMtd)
        assert len(ods) == 1
        assert ods[0].label == "face"
        assert ods[0].confidence == pytest.approx(0.9)
