"""Chebyshev filters (audiocheblimit/audiochebband) + audioiirfilter
coefficient-role parity."""

import numpy as np
import pytest

from gstreamer_tpu.audio.chebyshev import (calculate_gain,
                                           cheb_band_coefficients,
                                           cheb_limit_coefficients)
from gstreamer_tpu.core.parse import parse_launch


def _gain_at(a, b, freq, rate):
    w = 2 * np.pi * freq / rate
    return calculate_gain(a, b, np.cos(w), np.sin(w))


class TestLimitDesign:
    def test_lowpass_normalized_at_dc(self):
        a, b = cheb_limit_coefficients("low-pass", 1, 4, 1000.0, 0.25,
                                       44100)
        assert abs(calculate_gain(a, b, 1.0, 0.0) - 1.0) < 1e-12

    def test_lowpass_attenuates_stopband(self):
        a, b = cheb_limit_coefficients("low-pass", 1, 8, 1000.0, 0.25,
                                       44100)
        assert _gain_at(a, b, 10000, 44100) < 1e-3
        assert _gain_at(a, b, 500, 44100) > 0.9

    def test_highpass_normalized_at_nyquist(self):
        a, b = cheb_limit_coefficients("high-pass", 1, 4, 4000.0, 0.25,
                                       44100)
        assert abs(calculate_gain(a, b, -1.0, 0.0) - 1.0) < 1e-12
        assert _gain_at(a, b, 100, 44100) < 1e-3

    def test_type1_ripple_bounds_passband(self):
        ripple = 1.0
        a, b = cheb_limit_coefficients("low-pass", 1, 8, 4000.0, ripple,
                                       44100)
        freqs = np.linspace(50, 3600, 80)
        gains = np.array([_gain_at(a, b, f, 44100) for f in freqs])
        # ripple allows up to +ripple dB amplification in the passband
        assert gains.max() <= 10 ** (ripple / 20) + 1e-6
        assert gains.min() >= 10 ** (-ripple / 20) - 2e-2

    def test_type2_stopband_attenuation(self):
        ripple = 40.0  # type 2: stopband attenuation in dB
        a, b = cheb_limit_coefficients("low-pass", 2, 8, 2000.0, ripple,
                                       44100)
        freqs = np.linspace(6000, 21000, 60)
        gains = np.array([_gain_at(a, b, f, 44100) for f in freqs])
        assert gains.max() <= 10 ** (-ripple / 20) * 1.5

    def test_butterworth_special_case(self):
        # ripple 0, type 1 == Butterworth: monotonic passband
        a, b = cheb_limit_coefficients("low-pass", 1, 4, 4000.0, 0.0,
                                       44100)
        freqs = np.linspace(100, 3900, 40)
        gains = np.array([_gain_at(a, b, f, 44100) for f in freqs])
        assert (np.diff(gains) < 1e-9).all()
        assert gains.max() <= 1.0 + 1e-9

    def test_degenerate_cutoffs(self):
        a, b = cheb_limit_coefficients("low-pass", 1, 4, 0.0, 0.25, 44100)
        assert list(a) == [1.0] and list(b) == [0.0]
        a, b = cheb_limit_coefficients("low-pass", 1, 4, 30000.0, 0.25,
                                       44100)
        assert list(a) == [1.0] and list(b) == [1.0]
        a, b = cheb_limit_coefficients("high-pass", 1, 4, 30000.0, 0.25,
                                       44100)
        assert list(b) == [0.0]


class TestBandDesign:
    def test_bandpass_center_unity(self):
        a, b = cheb_band_coefficients("band-pass", 1, 8, 1000.0, 3000.0,
                                      0.25, 44100)
        assert abs(_gain_at(a, b, 2000, 44100) - 1.0) < 1e-9
        assert _gain_at(a, b, 100, 44100) < 1e-2
        assert _gain_at(a, b, 15000, 44100) < 1e-2

    def test_bandreject_notch(self):
        a, b = cheb_band_coefficients("band-reject", 1, 8, 1000.0,
                                      3000.0, 0.25, 44100)
        assert _gain_at(a, b, 2000, 44100) < 1e-2
        # sqrt(H(0)*H(ny)) normalization
        g0 = calculate_gain(a, b, 1.0, 0.0)
        gn = calculate_gain(a, b, -1.0, 0.0)
        assert abs(np.sqrt(g0 * gn) - 1.0) < 1e-9

    def test_empty_band_degenerate(self):
        a, b = cheb_band_coefficients("band-pass", 1, 8, 3000.0, 1000.0,
                                      0.25, 44100)
        assert list(b) == [0.0]


def _sine_rms_through(desc, freq, rate=44100, n=8192):
    p = parse_launch(
        f"audiotestsrc num-buffers=4 samplesperbuffer={n // 4} "
        f"wave=sine freq={freq} "
        f"! audio/x-raw,format=F64LE,rate={rate},channels=1 "
        f"! {desc} ! appsink name=out")
    p.run()
    sink = p.get_by_name("out")
    chunks = []
    while (s := sink.pull_sample()) is not None:
        chunks.append(np.asarray(s.buffer.data))
    x = np.concatenate(chunks, axis=0)
    # skip the transient
    return float(np.sqrt(np.mean(x[n // 2:] ** 2)))


class TestChebElements:
    def test_cheblimit_lowpass_pipeline(self):
        lo = _sine_rms_through(
            "audiocheblimit mode=low-pass cutoff=2000 poles=8", 440)
        hi = _sine_rms_through(
            "audiocheblimit mode=low-pass cutoff=2000 poles=8", 12000)
        assert lo > 0.5   # sine RMS 0.8*0.707~0.57 preserved
        assert hi < 0.01

    def test_chebband_bandpass_pipeline(self):
        mid = _sine_rms_through(
            "audiochebband mode=band-pass lower-frequency=500 "
            "upper-frequency=4000 poles=8", 1500)
        out = _sine_rms_through(
            "audiochebband mode=band-pass lower-frequency=500 "
            "upper-frequency=4000 poles=8", 12000)
        assert mid > 0.5
        assert out < 0.02

    def test_streaming_state_continuity(self):
        """Chunked processing equals one-shot (history carried)."""
        from scipy.signal import lfilter

        a, b = cheb_limit_coefficients("low-pass", 1, 4, 2000.0, 0.25,
                                       8000)
        rng = np.random.default_rng(7)
        x = rng.standard_normal((1024, 2))
        gold = lfilter(b, a, x, axis=0)

        p = parse_launch(
            "appsrc name=in ! audio/x-raw,format=F64LE,rate=8000,"
            "channels=2 ! audiocheblimit mode=low-pass cutoff=2000 "
            "poles=4 ! appsink name=out")
        from gstreamer_tpu.core.buffer import Buffer
        src = p.get_by_name("in")
        for i in range(0, 1024, 128):
            src.push_buffer(Buffer(data=x[i:i + 128]))
        src.end_of_stream()
        p.run()
        outs = []
        sink = p.get_by_name("out")
        while (s := sink.pull_sample()) is not None:
            outs.append(np.asarray(s.buffer.data))
        got = np.concatenate(outs, axis=0)
        np.testing.assert_allclose(got, gold, atol=1e-12)


class TestIirFilterRoles:
    def test_a_is_denominator(self):
        """gst 'a' = feed-back, 'b' = feed-forward
        (audioiirfilter.c:109-120)."""
        from gstreamer_tpu.core.element import element_factory_make
        el = element_factory_make("audioiirfilter")
        el.props["b"] = [1.0]
        el.props["a"] = [1.0, -0.5]

        from gstreamer_tpu.audio.info import AudioInfo
        from gstreamer_tpu.core.buffer import Buffer
        el._info = AudioInfo("F64LE", 8000, 1)
        el._zi = None
        x = np.zeros((8, 1))
        x[0, 0] = 1.0
        out = np.asarray(
            el.host_process(Buffer(data=x)).data).ravel()
        # y[n] = x[n] + 0.5 y[n-1]: impulse response 1, .5, .25, ...
        np.testing.assert_allclose(out, 0.5 ** np.arange(8), atol=1e-12)
