"""MPEG-TS mux/demux: packet layer, PSI, PES roundtrips."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.audioparsers import mp3_frame_info
from gstreamer_tpu.elements.mpegts import PKT, mpeg_crc32
from tests.test_audioparsers import make_mp3_frame


class TestTsLayer:
    def test_crc32_vector(self):
        # CRC-32/MPEG-2 check value for "123456789"
        assert mpeg_crc32(b"123456789") == 0x0376E6E7

    def test_packet_alignment(self, tmp_path):
        path = tmp_path / "a.ts"
        frames = [make_mp3_frame()[0] for _ in range(10)]
        p = parse_launch(
            f"appsrc name=in ! application/octet-stream ! "
            f"mpegaudioparse ! mpegtsmux location={path}")
        src = p.get_by_name("in")
        src.push_buffer(Buffer(
            data=np.frombuffer(b"".join(frames), np.uint8)))
        src.end_of_stream()
        p.run()
        p.set_state("null")
        blob = open(path, "rb").read()
        assert len(blob) % PKT == 0
        for pos in range(0, len(blob), PKT):
            assert blob[pos] == 0x47

    def test_roundtrip_mp3_frames(self, tmp_path):
        path = tmp_path / "r.ts"
        frames = [make_mp3_frame(fill=k)[0] for k in range(8)]
        p = parse_launch(
            f"appsrc name=in ! application/octet-stream ! "
            f"mpegaudioparse ! mpegtsmux location={path}")
        src = p.get_by_name("in")
        src.push_buffer(Buffer(
            data=np.frombuffer(b"".join(frames), np.uint8)))
        src.end_of_stream()
        p.run()
        p.set_state("null")

        d = parse_launch(
            f"tsdemux location={path} ! mpegaudioparse ! "
            f"appsink name=out")
        d.run()
        got = []
        while (s := d.get_by_name("out").pull_sample()) is not None:
            blobs = s.buffer.data if isinstance(s.buffer.data, list) \
                else list(s.buffer.data)
            got.extend(
                bytes(b) if isinstance(b, (bytes, bytearray))
                else np.asarray(b).tobytes() for b in blobs)
        assert b"".join(got) == b"".join(frames)

    def test_pts_carried(self, tmp_path):
        path = tmp_path / "p.ts"
        frames = [make_mp3_frame()[0] for _ in range(6)]
        p = parse_launch(
            f"appsrc name=in ! application/octet-stream ! "
            f"mpegaudioparse ! mpegtsmux location={path}")
        src = p.get_by_name("in")
        src.push_buffer(Buffer(
            data=np.frombuffer(b"".join(frames), np.uint8), pts=0))
        src.end_of_stream()
        p.run()
        p.set_state("null")
        d = parse_launch(f"tsdemux location={path} ! appsink name=out")
        d.run()
        ptss = []
        while (s := d.get_by_name("out").pull_sample()) is not None:
            ptss.append(s.buffer.pts)
        # 1152 samples @44100 ~ 26.12ms per frame (90kHz rounding)
        assert ptss[0] == 0
        assert all(b > a for a, b in zip(ptss, ptss[1:])
                   if a is not None and b is not None)


class TestTsVideo:
    def test_h264_over_ts(self, tmp_path):
        from tests.test_videoparsers import SC, make_slice, make_sps
        path = tmp_path / "v.ts"
        aus = [SC + make_sps() + SC + make_slice(0, idr=(k == 0))
               for k in range(6)]
        p = parse_launch(
            f"appsrc name=in ! application/octet-stream ! h264parse "
            f"! mpegtsmux location={path}")
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(b"".join(aus), np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        p.set_state("null")

        d = parse_launch(
            f"tsdemux location={path} ! h264parse ! appsink name=out")
        d.run()
        got = []
        while (s := d.get_by_name("out").pull_sample()) is not None:
            blobs = s.buffer.data if isinstance(s.buffer.data, list) \
                else [np.asarray(s.buffer.data)[k]
                      for k in range(s.buffer.batch)]
            got.extend(
                bytes(b) if isinstance(b, (bytes, bytearray))
                else np.asarray(b).tobytes() for b in blobs)
        assert b"".join(got) == b"".join(aus)


class TestSections:
    """PSI sections + SCTE-35 through the TS elements (reference
    tsdemux posts section messages, mpegtsmux scte-35-pid)."""

    def _mux(self, tmp_path, **extra):
        path = tmp_path / "s.ts"
        props = " ".join(f"{k}={v}" for k, v in extra.items())
        p = parse_launch(
            f"appsrc name=in ! application/octet-stream ! "
            f"mpegaudioparse ! mpegtsmux name=m location={path} "
            + props)
        src = p.get_by_name("in")
        frames = [make_mp3_frame(fill=k)[0] for k in range(6)]
        src.push_buffer(Buffer(
            data=np.frombuffer(b"".join(frames), np.uint8)))
        src.end_of_stream()
        return p, path

    def test_scte35_mux_demux_event(self, tmp_path):
        from gstreamer_tpu.utils import mpegts_sections as M
        p, path = self._mux(tmp_path, **{"scte-35-pid": 0x1E0,
                                         "service-name": "SvcOne"})
        mux = p.get_by_name("m")
        mux.send_splice(M.ScteSit.splice_out_new(
            42, 90000 * 2, 90000 * 30))
        mux.send_splice(M.ScteSit.splice_in_new(42, 90000 * 32))
        p.run()
        p.set_state("null")

        d = parse_launch(
            f"tsdemux location={path} ! mpegaudioparse ! "
            f"appsink name=out")
        d.run()
        sink = d.get_by_name("out")
        # SCTE-35 SITs arrive as custom downstream events
        from gstreamer_tpu.core.events import EventType
        scte = [e for e in sink.events
                if e.type == EventType.CUSTOM_DOWNSTREAM
                and e.data.get("name") == "scte-35"]
        assert len(scte) == 2
        ev0 = scte[0].data["sit"].splices[0]
        assert ev0.splice_event_id == 42
        assert ev0.out_of_network_indicator
        assert ev0.program_splice_time == 90000 * 2
        assert ev0.break_duration == 90000 * 30
        ev1 = scte[1].data["sit"].splices[0]
        assert not ev1.out_of_network_indicator
        assert ev1.program_splice_time == 90000 * 32
        # ... and as bus messages alongside PAT/PMT/SDT
        types = set()
        while (m := d.bus.pop_filtered("element")) is not None:
            if "section-type" in m.data:
                types.add(m.data["section-type"])
        assert {"pat", "pmt", "sdt", "scte-sit"} <= types

    def test_sdt_service_name_roundtrip(self, tmp_path):
        p, path = self._mux(tmp_path, **{"service-name": "MyChan",
                                         "provider-name": "Prov"})
        p.run()
        p.set_state("null")
        from gstreamer_tpu.utils import mpegts_sections as M
        blob = open(path, "rb").read()
        sdts = M.sections_from_packets(blob, 0x11)
        assert len(sdts) == 1
        st, prov, name = \
            sdts[0].table.services[0].descriptors[0].as_service()
        assert (prov, name) == ("Prov", "MyChan")

    def test_scte35_pid_in_pmt(self, tmp_path):
        from gstreamer_tpu.utils import mpegts_sections as M
        p, path = self._mux(tmp_path, **{"scte-35-pid": 0x1E0})
        p.run()
        p.set_state("null")
        blob = open(path, "rb").read()
        pmts = M.sections_from_packets(blob, 0x1000)
        scte = [s for s in pmts[0].table.streams
                if s.stream_type == 0x86]
        assert scte and scte[0].pid == 0x1E0
        assert scte[0].descriptors[0].tag == M.DESC_REGISTRATION
        assert scte[0].descriptors[0].data[:4] == b"CUEI"
        # the splice PID is NOT exposed as a selectable stream
        d = parse_launch(f"tsdemux location={path} stream=0 ! "
                         f"appsink name=o")
        d.run()
