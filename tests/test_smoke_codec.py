"""Smoke codec (gst-plugins-good/ext/jpeg/smokecodec.c port)."""

import struct

import numpy as np
import pytest

from gstreamer_tpu.codecs.smoke import (FLAG_KEYFRAME, IDX_FLAGS,
                                        IDX_NUM_BLOCKS, SmokeDecoder,
                                        SmokeEncoder, encode_id,
                                        find_best_size, parse_id)
from gstreamer_tpu.core.parse import parse_launch


def _frame(seed, w=64, h=48):
    r = np.random.default_rng(seed)
    return (r.integers(0, 255, (h, w)).astype(np.uint8),
            r.integers(0, 255, (h // 2, w // 2)).astype(np.uint8),
            r.integers(0, 255, (h // 2, w // 2)).astype(np.uint8))


class TestFormat:
    def test_id_packet(self):
        pkt = encode_id()
        assert pkt == b"\x80smoke\x00\x01\x00"
        assert parse_id(pkt)
        assert not parse_id(b"\x40xxxxxxxx")

    def test_find_best_size(self):
        # exact smokecodec.c fitting
        assert find_best_size(1) == (1, 1)
        assert find_best_size(4) == (2, 2)
        assert find_best_size(6) == (3, 2)
        w, h = find_best_size(7)
        assert w * h >= 7

    def test_keyframe_layout(self):
        enc = SmokeEncoder(64, 48, 25, 1)
        pkt = enc.encode(_frame(0))
        assert pkt[0] == 0x40                     # TYPE_DATA
        assert struct.unpack_from(">H", pkt, 1)[0] == 64
        assert struct.unpack_from(">H", pkt, 3)[0] == 48
        assert struct.unpack_from(">I", pkt, 5)[0] == 25
        assert pkt[IDX_FLAGS] & FLAG_KEYFRAME
        assert struct.unpack_from(">H", pkt, IDX_NUM_BLOCKS)[0] == 0

    def test_interframe_blocks(self):
        enc = SmokeEncoder(64, 48, 25, 1, keyframe_rate=1000)
        dec = SmokeDecoder()
        f0 = _frame(1)
        dec.decode(enc.encode(f0))
        f1 = tuple(p.copy() for p in f0)
        f1[0][0:16, 48:64] = 0                   # change block 3
        pkt = enc.encode(f1)
        assert not pkt[IDX_FLAGS] & FLAG_KEYFRAME
        n = struct.unpack_from(">H", pkt, IDX_NUM_BLOCKS)[0]
        ids = [struct.unpack_from(">H", pkt, 18 + 2 * i)[0]
               for i in range(n)]
        assert 3 in ids
        out = dec.decode(pkt)
        # untouched block bytes identical to previous decode
        assert out[0][16:, :].tobytes() == \
            dec._ref[0][16:, :].tobytes()

    def test_all_changed_promotes_keyframe(self):
        enc = SmokeEncoder(32, 32, 25, 1, keyframe_rate=1000)
        enc.encode(_frame(2, 32, 32))
        pkt = enc.encode(_frame(3, 32, 32))      # everything differs
        assert pkt[IDX_FLAGS] & FLAG_KEYFRAME


class TestElements:
    def test_pipeline_roundtrip(self):
        p = parse_launch(
            "videotestsrc num-buffers=5 pattern=ball ! "
            "video/x-raw,format=I420,width=64,height=48,"
            "framerate=10/1 ! smokeenc ! smokedec ! appsink "
            "name=out")
        p.run()
        frames = 0
        while (s := p.get_by_name("out").pull_sample()) is not None:
            y = np.asarray(s.buffer.data[0])
            frames += y.shape[0] if y.ndim == 3 else 1
        assert frames == 5

    def test_static_pattern_quality(self):
        g = parse_launch(
            "videotestsrc num-buffers=1 pattern=smpte ! "
            "video/x-raw,format=I420,width=64,height=48 ! appsink "
            "name=out")
        g.run()
        ref = np.asarray(g.get_by_name("out").pull_sample()
                         .buffer.data[0])[0]
        p = parse_launch(
            "videotestsrc num-buffers=1 pattern=smpte ! "
            "video/x-raw,format=I420,width=64,height=48 ! smokeenc "
            "! smokedec ! appsink name=out")
        p.run()
        got = np.asarray(p.get_by_name("out").pull_sample()
                         .buffer.data[0])[0]
        mse = ((got.astype(float) - ref) ** 2).mean()
        assert 10 * np.log10(255 ** 2 / max(mse, 1e-9)) > 28
