"""audioparsers: mp3/ac3 header math + flacparse framing."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.audioparsers import (ac3_frame_info,
                                                mp3_frame_info)


def make_mp3_frame(bitrate_idx=9, sr_idx=0, pad=0, layer=3,
                   fill=0xAA):
    """Synthesize one MPEG1 frame with a valid header."""
    b1 = 0xFF
    b2 = 0xE0 | (0b11 << 3) | ((4 - layer) << 1) | 1
    b3 = (bitrate_idx << 4) | (sr_idx << 2) | (pad << 1)
    b4 = 0x00                      # stereo
    hdr = bytes([b1, b2, b3, b4])
    info = mp3_frame_info(hdr)
    assert info is not None
    size = info[0]
    return hdr + bytes([fill]) * (size - 4), info


class TestMp3Header:
    def test_frame_size_table(self):
        # MPEG1 L3 128kbps @44100: 144*128000/44100 = 417 (+pad)
        frame, info = make_mp3_frame(bitrate_idx=9, sr_idx=0)
        assert info[0] == 417
        frame, info = make_mp3_frame(bitrate_idx=9, sr_idx=0, pad=1)
        assert info[0] == 418
        # 320kbps @48000: 144*320000/48000 = 960
        _, info = make_mp3_frame(bitrate_idx=14, sr_idx=1)
        assert info[0] == 960

    def test_invalid_headers_rejected(self):
        assert mp3_frame_info(b"\x00\x00\x00\x00") is None
        assert mp3_frame_info(b"\xff\xe0\x00\x00") is None  # free fmt

    def test_parse_pipeline(self):
        frames = [make_mp3_frame()[0] for _ in range(6)]
        blob = b"garbage!" + b"".join(frames)
        p = parse_launch(
            "appsrc name=in ! application/octet-stream ! mpegaudioparse ! appsink name=out")
        src = p.get_by_name("in")
        # feed in awkward chunks
        for i in range(0, len(blob), 333):
            src.push_buffer(Buffer(
                data=np.frombuffer(blob[i:i + 333], np.uint8)))
        src.end_of_stream()
        p.run()
        got = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            d = s.buffer.data
            d = d if isinstance(d, list) else list(d)
            got.extend(np.asarray(x).tobytes() if not isinstance(
                x, (bytes, bytearray)) else bytes(x) for x in d)
        assert b"".join(got) == b"".join(frames)
        assert all(g[:2] == b"\xff\xe7" or g[0] == 0xFF for g in got)
        assert len(got) == 6


class TestAc3Header:
    def test_frame_size(self):
        # fscod=0 (48k), frmsizecod=16 (256kbps): 256 words = 512 bytes
        hdr = bytes([0x0B, 0x77, 0, 0, (0 << 6) | 16])
        assert ac3_frame_info(hdr) == (512, 48000)
        # 44.1k variant row
        hdr = bytes([0x0B, 0x77, 0, 0, (1 << 6) | 16])
        assert ac3_frame_info(hdr) == (278 * 2, 44100)

    def test_parse_pipeline(self):
        size, rate = ac3_frame_info(
            bytes([0x0B, 0x77, 0, 0, 16]))
        frame = bytes([0x0B, 0x77, 0, 0, 16]) + b"\x55" * (size - 5)
        blob = b"\x00\x01" + frame * 4
        p = parse_launch("appsrc name=in ! application/octet-stream ! ac3parse ! appsink name=out")
        p.get_by_name("in").push_buffer(
            Buffer(data=np.frombuffer(blob, np.uint8)))
        p.get_by_name("in").end_of_stream()
        p.run()
        n = 0
        while (s := p.get_by_name("out").pull_sample()) is not None:
            n += s.buffer.batch
        assert n == 4


class TestFlacParse:
    def test_frames_flac_stream(self):
        from gstreamer_tpu.codecs import flac as pyflac
        rng = np.random.default_rng(1)
        x = (rng.standard_normal((4096 * 3 + 100, 1))
             * 3000).astype(np.int64)
        blob = pyflac.encode(x, 44100, bps=16)
        p = parse_launch(
            "appsrc name=in ! application/octet-stream ! flacparse ! appsink name=out")
        src = p.get_by_name("in")
        for i in range(0, len(blob), 1000):
            src.push_buffer(Buffer(
                data=np.frombuffer(blob[i:i + 1000], np.uint8)))
        src.end_of_stream()
        p.run()
        parts = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            d = s.buffer.data
            d = d if isinstance(d, list) else list(d)
            parts.extend(np.asarray(pc).tobytes() for pc in d)
        # part 0: full metadata header; then 4 frames; rejoining
        # yields the original stream byte-for-byte
        assert parts[0].startswith(b"fLaC")
        assert len(parts) == 1 + 4
        assert b"".join(parts) == blob
        # every audio frame re-decodes standalone after the header
        for k in range(1, len(parts)):
            sub = parts[0] + parts[k]
            got, si = pyflac.decode(sub)
            assert got.shape[1] == 1
