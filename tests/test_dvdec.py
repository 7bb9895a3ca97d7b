"""dvdemux ! dvdec: DIF frame splitting into the libavcodec DV
decoder (reference gst-plugins-good/ext/dv/gstdvdec.c; our dvdec
resolves to avdec_dvvideo the way gst-libav shadows it)."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.element import element_factory_make as make
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.native import av as native_av

pytestmark = pytest.mark.skipif(
    not (native_av.available()
         and native_av.have_codec("dvvideo", encoder=True)),
    reason="system libavcodec lacks the dvvideo codec")


def _dv_stream(n=3):
    """PAL DV frames (720x576 yuv420p, 144000 bytes each) with
    distinct luma levels."""
    from gstreamer_tpu.native.av import AvVideoEncoder

    enc = AvVideoEncoder("dvvideo", 720, 576, fps=(25, 1))
    out = bytearray()
    levels = []
    for k in range(n):
        lvl = 60 + 40 * k
        levels.append(lvl)
        y = np.full((576, 720), lvl, np.uint8)
        u = np.full((288, 360), 100, np.uint8)
        v = np.full((288, 360), 180, np.uint8)
        for item in enc.encode((y, u, v)):
            out += bytes(item[0] if isinstance(item, tuple) else item)
    return bytes(out), levels


class TestDvDec:
    def test_factories_registered(self):
        make("dvdec")
        make("avdec_dvvideo")

    def test_demux_decode_chain(self, tmp_path):
        raw, levels = _dv_stream(3)
        assert len(raw) == 3 * 144000
        p = parse_launch(
            "appsrc name=in ! video/x-dv, systemstream=true ! "
            "dvdemux ! dvdec ! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(raw, np.uint8), batch=1))
        p.get_by_name("in").end_of_stream()
        p.run()
        outs = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            planes = s.buffer.data
            ys = np.asarray(planes[0])
            for k in range(ys.shape[0]):
                outs.append([np.asarray(pl)[k] for pl in planes])
        assert len(outs) == 3
        for frame, lvl in zip(outs, levels):
            y, u, v = frame[:3]
            assert y.shape == (576, 720)
            assert abs(float(y.mean()) - lvl) < 3
            assert abs(float(u.mean()) - 100) < 4
            assert abs(float(v.mean()) - 180) < 4
