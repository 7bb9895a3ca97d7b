"""Adapter + rawvideoparse / rawaudioparse."""

import os
import tempfile

import numpy as np
import pytest

from gstreamer_tpu.core.adapter import Adapter
from gstreamer_tpu.core.parse import parse_launch


class TestAdapter:
    def test_push_take_flush(self):
        a = Adapter()
        a.push(np.arange(10, dtype=np.uint8))
        a.push(np.arange(10, 20, dtype=np.uint8))
        assert a.available() == 20
        assert np.array_equal(a.map(5), np.arange(5, dtype=np.uint8))
        assert a.available() == 20          # map doesn't consume
        got = a.take(12)
        assert np.array_equal(got, np.arange(12, dtype=np.uint8))
        assert a.available() == 8
        assert np.array_equal(a.take(8), np.arange(12, 20, dtype=np.uint8))

    def test_map_across_chunks(self):
        a = Adapter()
        for i in range(5):
            a.push(np.full(3, i, np.uint8))
        assert np.array_equal(a.take(7),
                              [0, 0, 0, 1, 1, 1, 2])
        assert np.array_equal(a.take(8), [2, 2, 3, 3, 3, 4, 4, 4])

    def test_prev_pts_distance(self):
        a = Adapter()
        a.push(np.zeros(10, np.uint8), pts=1000)
        a.push(np.zeros(10, np.uint8), pts=2000)
        a.flush(4)
        assert a.prev_pts() == (1000, 4)
        a.flush(8)          # crosses into chunk 2
        assert a.prev_pts() == (2000, 2)

    def test_short_map_returns_none(self):
        a = Adapter()
        a.push(np.zeros(3, np.uint8))
        assert a.map(4) is None


class TestRawVideoParse:
    def test_parse_i420_stream(self, tmp_path):
        w, h = 16, 8
        fsz = w * h * 3 // 2
        rng = np.random.RandomState(0)
        payload = rng.randint(0, 256, 3 * fsz + 7, dtype=np.uint8)
        f = tmp_path / "frames.raw"
        f.write_bytes(payload.tobytes())
        pipe = parse_launch(
            f"filesrc location={f} blocksize=100 ! "
            f"rawvideoparse width={w} height={h} format=I420 "
            f"framerate=10/1 ! appsink name=o")
        pipe.run()
        sink = pipe.get_by_name("o")
        ys = []
        while True:
            s = sink.pull_sample()
            if s is None:
                break
            y = np.asarray(s.buffer.data[0])
            ys.append(y.reshape(-1, h, w))
        ys = np.concatenate(ys)
        assert ys.shape[0] == 3      # trailing partial frame dropped
        assert np.array_equal(ys[0], payload[:w * h].reshape(h, w))
        assert np.array_equal(ys[2],
                              payload[2 * fsz:2 * fsz + w * h].reshape(h, w))

    def test_pts_from_framerate(self, tmp_path):
        w, h = 8, 4
        fsz = w * h * 3 // 2
        f = tmp_path / "x.raw"
        f.write_bytes(bytes(2 * fsz))
        pipe = parse_launch(
            f"filesrc location={f} blocksize={fsz} ! "
            f"rawvideoparse width={w} height={h} format=I420 "
            f"framerate=25/1 ! appsink name=o")
        pipe.run()
        sink = pipe.get_by_name("o")
        pts = []
        while True:
            s = sink.pull_sample()
            if s is None:
                break
            pts.append(s.buffer.pts)
        assert pts[0] == 0
        assert pts[1] == 40_000_000


class TestRawAudioParse:
    def test_parse_s16_stream(self, tmp_path):
        rng = np.random.RandomState(1)
        samples = rng.randint(-32768, 32767, (100, 2), dtype=np.int16)
        f = tmp_path / "a.raw"
        f.write_bytes(samples.astype("<i2").tobytes())
        pipe = parse_launch(
            f"filesrc location={f} blocksize=64 ! "
            f"rawaudioparse pcm-format=S16LE sample-rate=8000 "
            f"num-channels=2 ! appsink name=o")
        pipe.run()
        sink = pipe.get_by_name("o")
        out = []
        while True:
            s = sink.pull_sample()
            if s is None:
                break
            out.append(np.asarray(s.buffer.data))
        got = np.concatenate(out)
        assert got.shape == (100, 2)
        assert np.array_equal(got, samples)
