"""midiparse / irtspparse / unixfd bridge
(gst-plugins-bad gst/midi, gst/pcapparse/gstirtspparse.c,
gst/unixfd)."""

import threading
import time

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.midi_irtsp import (parse_smf,
                                               smf_events_with_time)
from gstreamer_tpu.net.rtp import rtp_header


def _vl(n):
    out = [n & 0x7F]
    n >>= 7
    while n:
        out.insert(0, 0x80 | (n & 0x7F))
        n >>= 7
    return bytes(out)


def _smf(division=480, tempo=500000):
    track = b""
    track += _vl(0) + bytes([0xFF, 0x51, 3]) + tempo.to_bytes(3, "big")
    track += _vl(0) + bytes([0x90, 60, 100])
    track += _vl(division) + bytes([0x80, 60, 0])
    # running status: second note-on omits the status byte
    track += _vl(0) + bytes([0x90, 64, 100])
    track += _vl(division) + bytes([64, 0])      # running status
    track += _vl(0) + bytes([0xFF, 0x2F, 0])
    smf = b"MThd" + (6).to_bytes(4, "big") + (0).to_bytes(2, "big") \
        + (1).to_bytes(2, "big") + division.to_bytes(2, "big")
    return smf + b"MTrk" + len(track).to_bytes(4, "big") + track


class TestSmf:
    def test_parse_structure(self):
        division, tracks = parse_smf(_smf())
        assert division == 480 and len(tracks) == 1
        assert tracks[0][1][1][:1] == b"\x90"

    def test_running_status(self):
        _, tracks = parse_smf(_smf())
        evs = [ev for _, ev in tracks[0]]
        # the running-status note used 0x90 implicitly
        assert evs[4] == bytes([0x90, 64, 0])

    def test_tempo_mapping(self):
        evs = smf_events_with_time(_smf(tempo=600000))
        offs = {ev[:1]: ns for ns, ev in evs if ev[:1] == b"\x80"}
        assert offs[b"\x80"] == 600_000_000      # 1 beat at 100 bpm

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            parse_smf(b"not midi")


class TestMidiParseElement:
    def test_timestamped_events(self, tmp_path):
        path = tmp_path / "t.mid"
        path.write_bytes(_smf())
        p = parse_launch(f"midiparse location={path} ! appsink "
                         f"name=out")
        p.run()
        evs = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            d = s.buffer.data
            for b in (d if isinstance(d, (list, tuple)) else [d]):
                evs.append(np.asarray(b).tobytes())
        assert any(e[:1] == b"\x90" for e in evs)
        assert any(e[:2] == b"\xff\x2f" for e in evs)


class TestIrtspParse:
    def test_channel_filter(self):
        pkt0 = rtp_header(96, 0, 0, 1) + b"chan0"
        pkt1 = rtp_header(96, 1, 0, 1) + b"chan1!"
        stream = b""
        for ch, pkt in ((0, pkt0), (1, pkt1), (0, pkt0)):
            stream += bytes([0x24, ch]) \
                + len(pkt).to_bytes(2, "big") + pkt
        for ch, want in ((0, [pkt0, pkt0]), (1, [pkt1])):
            p = parse_launch(
                f"appsrc name=in ! application/octet-stream ! "
                f"irtspparse channel-id={ch} ! appsink name=out")
            p.get_by_name("in").push_buffer(Buffer(
                data=np.frombuffer(stream, np.uint8), pts=0))
            p.get_by_name("in").end_of_stream()
            p.run()
            got = []
            while (s := p.get_by_name("out")
                    .pull_sample()) is not None:
                d = s.buffer.data
                arr = np.asarray(d if not isinstance(d, (list, tuple))
                                 else d[0])
                if arr.ndim > 1:
                    got.extend(bytes(r.tobytes()) for r in arr)
                else:
                    got.append(arr.tobytes())
            assert got == want

    def test_resync_on_garbage(self):
        pkt = rtp_header(96, 0, 0, 1) + b"x"
        stream = b"junk" + bytes([0x24, 0]) \
            + len(pkt).to_bytes(2, "big") + pkt
        p = parse_launch(
            "appsrc name=in ! application/octet-stream ! irtspparse "
            "! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(stream, np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        assert np.asarray(s.buffer.data).tobytes() == pkt


class TestUnixFd:
    def test_bridge(self, tmp_path):
        path = tmp_path / "ufd.sock"
        got = []

        def receiver():
            time.sleep(0.3)
            r = parse_launch(
                f"unixfdsrc socket-path={path} timeout=3.0 "
                f"num-buffers=3 ! appsink name=out")
            r.run()
            while (s := r.get_by_name("out")
                    .pull_sample()) is not None:
                got.append(np.asarray(s.buffer.data).tobytes())

        t = threading.Thread(target=receiver)
        t.start()
        p = parse_launch(
            f"audiotestsrc num-buffers=3 samplesperbuffer=100 ! "
            f"audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            f"unixfdsink socket-path={path}")
        p.run()
        p.set_state("null")
        t.join(timeout=10)
        assert len(got) == 3
        assert all(len(b) == 200 for b in got)
