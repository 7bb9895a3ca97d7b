"""pitch element (gst-plugins-bad/ext/soundtouch/gstpitch.cc
semantics: pitch shifts frequency at constant duration, tempo changes
duration at constant frequency, rate changes both)."""

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch


def _run_pitch(props, nbuf=16, spb=1000, freq=440, rate=8000):
    p = parse_launch(
        f"audiotestsrc num-buffers={nbuf} samplesperbuffer={spb} "
        f"freq={freq} ! audio/x-raw,format=F32LE,rate={rate},"
        f"channels=1 ! pitch {props} ! appsink name=out")
    p.run()
    out = []
    while (s := p.get_by_name("out").pull_sample()) is not None:
        out.append(np.asarray(s.buffer.data).ravel())
    return np.concatenate(out) if out else np.zeros(0, np.float32)


def _dominant(y, rate=8000):
    n = min(len(y), 8192)
    seg = y[len(y) // 4:len(y) // 4 + n]
    sp = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    return np.argmax(sp) * rate / len(seg)


class TestPitch:
    def test_identity(self):
        y = _run_pitch("pitch=1.0")
        assert len(y) == 16000
        assert abs(_dominant(y) - 440) < 10

    @pytest.mark.parametrize("pv", [2.0, 0.5, 1.5])
    def test_pitch_shifts_frequency_not_duration(self, pv):
        y = _run_pitch(f"pitch={pv}")
        # duration preserved within WSOLA granularity
        assert abs(len(y) - 16000) < 1200
        f = _dominant(y)
        assert abs(f - 440 * pv) < 440 * pv * 0.06

    def test_tempo_changes_duration_not_pitch(self):
        y = _run_pitch("tempo=2.0", nbuf=24)
        assert abs(len(y) - 12000) < 1500        # 24000/2
        assert abs(_dominant(y) - 440) < 45

    def test_rate_changes_both(self):
        y = _run_pitch("rate=2.0")
        assert abs(len(y) - 8000) < 200          # 16000/2
        assert abs(_dominant(y) - 880) < 60

    def test_stereo(self):
        p = parse_launch(
            "audiotestsrc num-buffers=6 samplesperbuffer=1000 ! "
            "audio/x-raw,format=F32LE,rate=8000,channels=2 ! "
            "pitch pitch=1.3 ! appsink name=out")
        p.run()
        s = p.get_by_name("out").pull_sample()
        assert np.asarray(s.buffer.data).shape[1] == 2
