"""dtmfsrc tone math, icydemux, thin parsers (aac/amr/dca)."""

import math
import struct

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.dtmf_icy import (DTMF_KEYS, adts_frame_len,
                                             generate_dtmf)


class TestDtmf:
    def test_tone_math_gold(self):
        got = generate_dtmf("5", 100, 8000, volume_db=6)
        f1, f2 = DTMF_KEYS["5"]
        vf = 10 ** (-6 / 20)
        for i in range(100):
            amp = (math.sin(2 * math.pi * f1 * (i / 8000))
                   + math.sin(2 * math.pi * f2 * (i / 8000))) / 2
            assert got[i] == int(amp * vf * 32767)

    def test_spectrum_has_both_tones(self):
        p = parse_launch(
            "dtmfsrc tones=1 tone-duration=500 ! appsink name=out")
        p.run()
        x = np.asarray(
            p.get_by_name("out").pull_sample().buffer.data)[:, 0]
        spec = np.abs(np.fft.rfft(x[:4000] * np.hanning(4000)))
        freqs = np.fft.rfftfreq(4000, 1 / 8000)
        peaks = freqs[np.argsort(spec)[-6:]]
        assert any(abs(p - 697) < 5 for p in peaks)
        assert any(abs(p - 1209) < 5 for p in peaks)

    def test_sequence_timing(self):
        p = parse_launch(
            "dtmfsrc tones=12 tone-duration=100 inter-tone-gap=50 ! "
            "appsink name=out")
        p.run()
        n = 0
        sink = p.get_by_name("out")
        while (s := sink.pull_sample()) is not None:
            n += np.asarray(s.buffer.data).shape[0]
        assert n == 2 * (800 + 400)


class TestIcyDemux:
    def test_metadata_stripped(self, tmp_path):
        meta = b"StreamTitle='My Song';"
        pad = (-len(meta)) % 16
        block = bytes([(len(meta) + pad) // 16]) + meta + b"\0" * pad
        payload = bytes(range(64)) * 4
        stream = payload[:100] + block + payload[100:200] + block \
            + payload[200:]
        f = tmp_path / "icy.bin"
        f.write_bytes(stream)
        p = parse_launch(
            f"icydemux location={f} metaint=100 ! appsink name=out")
        p.run()
        got = np.asarray(
            p.get_by_name("out").pull_sample().buffer.data).tobytes()
        assert got == payload
        titles = []
        while (m := p.bus.pop()) is not None:
            if m.type == "tag":
                titles.extend(m.data.get("title", []))
        assert titles == ["My Song", "My Song"]


def _adts_frame(size=64, sr_idx=4):
    hdr = bytearray(7)
    hdr[0] = 0xFF
    hdr[1] = 0xF1
    hdr[2] = (1 << 6) | (sr_idx << 2)
    hdr[3] = (size >> 11) & 0x3
    hdr[4] = (size >> 3) & 0xFF
    hdr[5] = ((size & 0x7) << 5) | 0x1F
    hdr[6] = 0xFC
    return bytes(hdr) + b"\xAA" * (size - 7)


class TestThinParsers:
    def test_adts_len_roundtrip(self):
        f = _adts_frame(123)
        assert adts_frame_len(f) == 123

    def test_aacparse_pipeline(self):
        frames = [_adts_frame(64 + k) for k in range(5)]
        p = parse_launch(
            "appsrc name=in ! application/octet-stream ! aacparse ! "
            "appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(b"xx" + b"".join(frames), np.uint8)))
        p.get_by_name("in").end_of_stream()
        p.run()
        got = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            d = s.buffer.data
            d = d if isinstance(d, list) else [
                np.asarray(d)[k] for k in range(s.buffer.batch)]
            got.extend(np.asarray(x).tobytes() for x in d)
        assert got == frames

    def test_amrparse_nb(self):
        # mode 2 frames: block 15 + 1 toc byte
        frame = bytes([2 << 3]) + b"\x55" * 15
        blob = b"#!AMR\n" + frame * 4
        p = parse_launch(
            "appsrc name=in ! application/octet-stream ! amrparse ! "
            "appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(blob, np.uint8)))
        p.get_by_name("in").end_of_stream()
        p.run()
        n = 0
        while (s := p.get_by_name("out").pull_sample()) is not None:
            n += s.buffer.batch
        assert n == 4

    def test_dcaparse_pipeline(self):
        size = 96
        hdr = bytearray(16)
        hdr[0:4] = b"\x7f\xfe\x80\x01"
        v = size - 1
        hdr[5] = (v >> 12) & 0x3
        hdr[6] = (v >> 4) & 0xFF
        hdr[7] = (v & 0xF) << 4
        frame = bytes(hdr) + b"\x11" * (size - 16)
        p = parse_launch(
            "appsrc name=in ! application/octet-stream ! dcaparse ! "
            "appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(frame * 3, np.uint8)))
        p.get_by_name("in").end_of_stream()
        p.run()
        n = 0
        while (s := p.get_by_name("out").pull_sample()) is not None:
            n += s.buffer.batch
        assert n == 3
