"""Round-5 tail: OGM parsers, ogg-in-avi, remaining RTP depayloaders,
qtmux moov-recovery + qtmoovrecover."""

import json
import struct

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.element import element_factory_make as make
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.net.rtp import rtp_header
from gstreamer_tpu.net.rtp_tail import adu_to_mp3
from tests.test_audioparsers import make_mp3_frame


def mp3_frame_mdb0():
    """A frame whose side info declares main_data_begin = 0 (the
    ADU == frame case)."""
    f = bytearray(make_mp3_frame()[0])
    f[4] = 0                 # main_data_begin high 8 bits
    f[5] &= 0x7F             # low bit
    return bytes(f)


def ogm_header(kind: bytes, subtype: bytes, time_unit=333667,
               samples_per_unit=1, extra=b"\0" * 8) -> bytes:
    hdr = bytearray(b"\x01" + kind + subtype)
    hdr += struct.pack("<i", 52)              # size
    hdr += struct.pack("<q", time_unit)       # 100ns units per sample
    hdr += struct.pack("<q", samples_per_unit)
    hdr += struct.pack("<i", 1)               # default_len
    hdr += struct.pack("<i", 65536)           # buffersize
    hdr += struct.pack("<i", 16)              # bits_per_sample
    hdr += extra                              # kind-specific @44
    return bytes(hdr)


def ogm_packet(payload: bytes, samples: int, keyframe=True) -> bytes:
    nlen = 1 if samples < 256 else 2
    b0 = ((nlen & 3) << 6) | ((nlen >> 2) << 1) \
        | (0x08 if keyframe else 0)
    lenbytes = samples.to_bytes(nlen, "little")
    return bytes([b0]) + lenbytes + payload


class TestOgmParse:
    def test_video_stream(self):
        hdr = ogm_header(b"video\x00\x00\x00", b"XVID",
                         extra=struct.pack("<ii", 320, 240))
        pkts = [hdr] + [ogm_packet(bytes([k]) * 50, 1, k == 0)
                        for k in range(3)]
        e = make("ogmvideoparse")
        e.start()
        outs = []
        for p in pkts:
            b = e.host_process(Buffer(
                data=np.frombuffer(p, np.uint8), batch=1))
            if b is not None:
                outs.append(b)
        assert str(e._caps[0].name) == "video/mpeg"
        assert e._caps[0]["width"] == 320
        got = [bytes(np.asarray(b.data).ravel()) for b in outs]
        assert got == [bytes([k]) * 50 for k in range(3)]
        # pts from granulepos * time_unit * 100ns
        assert outs[1].pts == 333667 * 100

    def test_audio_stream(self):
        hdr = ogm_header(b"audio\x00\x00\x00", b"0055",
                         samples_per_unit=44100,
                         extra=struct.pack("<hhi", 2, 4, 176400))
        e = make("ogmaudioparse")
        e.start()
        e.host_process(Buffer(data=np.frombuffer(hdr, np.uint8)))
        b = e.host_process(Buffer(data=np.frombuffer(
            ogm_packet(b"x" * 100, 1152), np.uint8)))
        assert e._caps[0].name == "audio/mpeg"
        assert e._caps[0]["rate"] == 44100
        assert bytes(np.asarray(b.data).ravel()) == b"x" * 100

    def test_text_stream(self):
        hdr = ogm_header(b"text\x00\x00\x00\x00", b"\0\0\0\0")
        e = make("ogmtextparse")
        e.start()
        e.host_process(Buffer(data=np.frombuffer(hdr, np.uint8)))
        b = e.host_process(Buffer(data=np.frombuffer(
            ogm_packet(b"hello\0\0", 100), np.uint8)))
        assert bytes(np.asarray(b.data).ravel()) == b"hello"


class TestOggAvi:
    def test_vorbis_header_lacing(self):
        h1, h2, h3 = b"\x01vorbis" + b"a" * 20, b"\x03vorbis", \
            b"\x05vorbis" + b"b" * 300
        first = bytes([2, len(h1), len(h2)]) + h1 + h2 + h3
        e = make("oggaviparse")
        e.start()
        b = e.host_process(Buffer(data=np.frombuffer(first, np.uint8)))
        got = [bytes(np.asarray(x).ravel()) for x in b.data]
        assert got == [h1, h2, h3]
        b2 = e.host_process(Buffer(
            data=np.frombuffer(b"packet", np.uint8)))
        assert bytes(np.asarray(b2.data).ravel()) == b"packet"

    def test_lacing_255_continuation(self):
        h1 = b"x" * 300                       # needs 255 + 45
        h2 = b"y" * 5
        h3 = b"z" * 10
        first = bytes([2, 255, 45, len(h2)]) + h1 + h2 + h3
        e = make("oggaviparse")
        e.start()
        b = e.host_process(Buffer(data=np.frombuffer(first, np.uint8)))
        got = [bytes(np.asarray(x).ravel()) for x in b.data]
        assert got == [h1, h2, h3]


class TestAduMp3:
    def test_roundtrip_no_reservoir(self):
        """ADUs with main_data_begin=0 rebuild the identical frames."""
        frames = [mp3_frame_mdb0() for _ in range(4)]
        out = adu_to_mp3(frames)
        assert out == b"".join(frames)

    def test_depay_element(self):
        frames = [mp3_frame_mdb0() for _ in range(6)]
        e = make("rtpmparobustdepay")
        e.start()
        pkts = []
        seq = 0
        for f in frames:
            # one ADU per packet, 1-byte descriptor when it fits
            if len(f) < 64:
                desc = bytes([len(f)])
            else:
                desc = bytes([0x40 | (len(f) >> 8), len(f) & 0xFF])
            pkts.append(rtp_header(96, seq, seq * 1152, 0xAA)
                        + desc + f)
            seq += 1
        out = e.host_process(Buffer(data=pkts, batch=len(pkts)))
        tail = e.host_process(None)
        got = b""
        for b in (out, tail):
            if b is not None:
                d = b.data if isinstance(b.data, list) else [b.data]
                got += b"".join(bytes(np.asarray(x).ravel())
                                for x in d)
        assert got == b"".join(frames)


class TestRtpXqt:
    def test_pck2_framed_samples(self):
        samples = [b"A" * 10, b"B" * 7]
        payload = bytearray([0x10 | (2 << 2), 0, 0, 0])
        for s in samples:
            payload += bytes([0x80, 0]) + struct.pack(">H", len(s))
            payload += b"\0\0\0\0"
            payload += s + b"\0" * ((-len(s)) % 4)
        pkt = rtp_header(96, 1, 1000, 0xBB, marker=True) \
            + bytes(payload)
        e = make("rtpxqtdepay")
        e.start()
        out = e.host_process(Buffer(data=[pkt], batch=1))
        got = [bytes(np.asarray(x).ravel())
               for x in (out.data if isinstance(out.data, list)
                         else [out.data])]
        assert got == samples

    def test_pck3_fragmented(self):
        frame = bytes(range(200))
        e = make("rtpxqtdepay")
        e.start()
        h1 = bytes([0x10 | (3 << 2), 0, 0, 0])
        p1 = rtp_header(96, 1, 1000, 0xBB) + h1 + frame[:100]
        p2 = rtp_header(96, 2, 1000, 0xBB, marker=True) + h1 \
            + frame[100:]
        out = e.host_process(Buffer(data=[p1, p2], batch=2))
        assert bytes(np.asarray(out.data).ravel()) == frame


class TestRtpSv3v:
    def test_config_and_frame(self):
        e = make("rtpsv3vdepay")
        e.start()
        # config packet: C bit, width=320 height=240
        w, h = 320, 240
        cfg = bytearray(6)
        cfg[0] = 0x40
        cfg[2] = (w >> 7) & 0x1F
        cfg[3] = ((w & 0x7F) << 1) | ((h >> 11) & 1)
        cfg[4] = (h >> 3) & 0xFF
        cfg[5] = (h & 7) << 5
        p0 = rtp_header(96, 1, 0, 0xCC) + bytes(cfg)
        frame = b"svq3data" * 10
        p1 = rtp_header(96, 2, 0, 0xCC) + b"\0\0" + frame[:40]
        p2 = rtp_header(96, 3, 0, 0xCC, marker=True) + b"\0\0" \
            + frame[40:]
        out = e.host_process(Buffer(data=[p0, p1, p2], batch=3))
        assert e.width == 320 and e.height == 240
        assert bytes(np.asarray(out.data).ravel()) == frame


class TestRtpAsf:
    def test_roundtrip(self):
        packets = [bytes([k]) * 900 for k in range(3)]
        pay = make("rtpasfpay", mtu=400)
        dep = make("rtpasfdepay")
        pay.start()
        dep.start()
        out = pay.host_process(Buffer(data=packets, batch=3,
                                      pts=0, duration=10_000_000))
        res = dep.host_process(Buffer(data=out.data,
                                      batch=len(out.data)))
        got = [bytes(np.asarray(x).ravel())
               for x in (res.data if isinstance(res.data, list)
                         else [res.data])]
        assert got == packets


class TestQtMoovRecover:
    def _record(self, tmp_path, crash=False):
        broken = tmp_path / "rec.mov"
        journal = tmp_path / "rec.journal"
        p = parse_launch(
            f"appsrc name=in ! video/x-raw, format=UYVY, width=32, "
            f"height=16, framerate=30/1 ! qtmux name=m "
            f"location={broken} moov-recovery-file={journal}")
        rng = np.random.default_rng(0)
        frames = tuple(rng.integers(0, 256, (4, 16, 32), np.uint8)
                       for s in range(1))
        from gstreamer_tpu.video.info import VideoInfo

        vi = VideoInfo(format="UYVY", width=32, height=16)
        planes = tuple(rng.integers(0, 256, (4,) + s, np.uint8)
                       for s in vi.plane_shapes())
        p.get_by_name("in").push_buffer(Buffer(
            data=planes, batch=4, pts=0, duration=33333333))
        p.get_by_name("in").end_of_stream()
        if crash:
            # run the pipeline but skip finalization (simulated crash:
            # mdat + journal on disk, no moov)
            from gstreamer_tpu.core.pipeline import State
            p.set_state(State.PLAYING)
            p.tick()
            m = p.get_by_name("m")
            m._rec_file.flush()
            m._rec_file.close()
            m._rec_journal.close()
            m._rec_file = m._rec_journal = None
            m._tracks = {}              # suppress normal stop output
        else:
            p.run()
            p.set_state("null")
        return broken, journal

    def test_journal_written(self, tmp_path):
        broken, journal = self._record(tmp_path, crash=False)
        lines = journal.read_text().splitlines()
        head = json.loads(lines[0])
        assert "tracks" in head and len(lines) == 5
        # clean completion produced a playable file
        assert b"moov" in broken.read_bytes()

    def test_recover_after_crash(self, tmp_path):
        broken, journal = self._record(tmp_path, crash=True)
        raw = broken.read_bytes()
        assert b"moov" not in raw            # crashed: no moov
        fixed = tmp_path / "fixed.mov"
        p = parse_launch(
            f"qtmoovrecover broken-input={broken} "
            f"recovery-input={journal} fixed-output={fixed}")
        from gstreamer_tpu.core.pipeline import State
        p.set_state(State.PLAYING)
        msgs = [m for m in iter(lambda: p.bus.pop(), None)
                if m.type == "element"
                and m.data.get("name") == "qtmoovrecover-done"]
        assert msgs and msgs[0].data["samples"] == 4
        # the fixed file demuxes
        d = parse_launch(f"qtdemux location={fixed} ! appsink name=o")
        d.run()
        s = d.get_by_name("o").pull_sample()
        assert s is not None
