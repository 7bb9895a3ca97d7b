"""Audio chain tests (modeled on tests/check/elements/audioconvert.c,
audioresample.c — incl. the FFT signal-quality pattern :1214 and the
perfect-stream pattern :220)."""

import math

import numpy as np
import pytest

from gstreamer_tpu.audio import channel_mixer as chmix
from gstreamer_tpu.audio import format as afmt
from gstreamer_tpu.audio.info import AudioInfo
from gstreamer_tpu.audio.resampler import METHOD_KAISER, AudioResampler
from gstreamer_tpu.core.parse import parse_launch

RNG = np.random.default_rng(11)


class TestFormat:
    @pytest.mark.parametrize("name", ["S8", "U8", "S16LE", "U16LE",
                                      "S24_32LE", "S32LE", "S24LE",
                                      "F32LE", "F64LE"])
    def test_unpack_pack_roundtrip(self, name):
        f = afmt.format_info(name)
        if f.is_float:
            x = (RNG.random((64, 2)) * 2 - 1).astype(
                np.float32 if f.width == 32 else np.float64)
        else:
            lo = -(1 << (f.depth - 1)) if f.is_signed else 0
            hi = (1 << (f.depth - 1)) if f.is_signed else (1 << f.depth)
            x = RNG.integers(lo, hi, (64, 2)).astype(np.int64)
            if f.width <= 16:
                x = x.astype(np.int16 if f.is_signed else np.uint16)
            if f.width == 8:
                x = x.astype(np.int8 if f.is_signed else np.uint8)
        canon = afmt.unpack(np, f, x)
        back = afmt.pack(np, f, canon)
        np.testing.assert_array_equal(np.asarray(back, np.float64),
                                      np.asarray(x, np.float64))

    def test_s16_replication_exact(self):
        # audio_orc_unpack_s16: (w<<16)|(w^0x8000)
        f = afmt.format_info("S16LE")
        x = np.array([[32767], [-32768], [0], [1], [-1]], np.int16)
        v = afmt.unpack(np, f, x)
        assert v[0, 0] == 0x7FFFFFFF
        assert v[1, 0] == -0x80000000
        assert v[2, 0] == 0x00008000  # 0 -> low copy sign-flipped

    def test_double_to_s32_clamp(self):
        v = afmt.double_to_s32(np, np.array([1.0, -1.0, 0.5, 2.0]))
        assert v[0] == 2147483647      # positive overflow clamped
        assert v[1] == -2147483648
        assert v[2] == 1073741824

    def test_bytes_roundtrip_s24(self):
        f = afmt.format_info("S24LE")
        x = RNG.integers(-(1 << 23), 1 << 23, (32, 2)).astype(np.int32)
        b = afmt.to_bytes(f, x)
        back = afmt.from_bytes(f, b, 2)
        np.testing.assert_array_equal(x, back)


class TestChannelMixer:
    def test_stereo_to_mono(self):
        m = chmix.build_matrix(("front-left", "front-right"), ("mono",))
        np.testing.assert_allclose(m[:, 0], [0.5, 0.5])

    def test_mono_to_stereo(self):
        m = chmix.build_matrix(("mono",), ("front-left", "front-right"))
        np.testing.assert_allclose(m[0], [1.0, 1.0])

    def test_identity(self):
        pos = ("front-left", "front-right")
        m = chmix.build_matrix(pos, pos)
        assert chmix.is_passthrough(m)

    def test_5_1_to_stereo_normalized(self):
        from gstreamer_tpu.audio.info import DEFAULT_POSITIONS
        m = chmix.build_matrix(DEFAULT_POSITIONS[6], DEFAULT_POSITIONS[2])
        # every output column sums to <= 1 after normalization
        assert np.abs(m).sum(axis=0).max() <= 1.0 + 1e-6
        assert (m > 0).any()

    def test_int_mix_rounding(self):
        m = np.array([[0.5], [0.5]], np.float32)
        mi = chmix.matrix_int(m)
        x = np.array([[100, 101]], np.int64)
        out = chmix.mix_int(np, x, mi)
        # (100*512 + 101*512 + 512) >> 10 = 100 (with round)
        assert out[0, 0] == ((100 * 512 + 101 * 512 + 512) >> 10)


class TestResampler:
    def test_kaiser_taps_48_to_16(self):
        r = AudioResampler(METHOD_KAISER, 48000, 16000)
        assert r.in_red == 3 and r.out_red == 1
        assert r.n_taps % 8 == 0
        t = r.taps_for("s16")
        assert t.shape[0] == 1
        assert t.sum() == (1 << 15) - 1   # DC-exact

    def test_dc_preservation_s16(self):
        r = AudioResampler(METHOD_KAISER, 48000, 16000)
        x = np.full((48000 // 10, 2), 1000, np.int16)
        out = r.resample_ref(x.astype(np.int64), "s16")
        mid = out[len(out) // 4: -len(out) // 4]
        assert np.abs(mid.astype(int) - 1000).max() <= 1

    def test_sine_frequency_preserved(self):
        # the reference's FFT quality test pattern (audioresample.c:1214)
        in_rate, out_rate, freq = 48000, 16000, 440.0
        r = AudioResampler(METHOD_KAISER, in_rate, out_rate)
        n = 4800
        t = np.arange(n) / in_rate
        x = (np.sin(2 * np.pi * freq * t) * 16000).astype(np.int64)[:, None]
        out = r.resample_ref(x, "s16").astype(np.float64)[:, 0]
        out = out[100:-100]
        spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
        peak_bin = spec.argmax()
        peak_freq = peak_bin * out_rate / len(out)
        assert abs(peak_freq - freq) < 12
        # energy concentrated around the peak (±2 bins for leakage)
        rest = spec.copy()
        rest[max(0, peak_bin - 2):peak_bin + 3] = 0
        assert spec[peak_bin] > 50 * rest.max()

    def test_device_matches_gold(self):
        import jax
        import jax.numpy as jnp
        r = AudioResampler(METHOD_KAISER, 44100, 48000)
        n = 44100 // 10  # multiple of in_red (147): 4410 = 147*30
        x = RNG.integers(-30000, 30000, (n, 2)).astype(np.int64)
        gold = r.resample_ref(x, "s16")
        fn = jax.jit(r.resample_fn("s16", n, 2))
        got = np.asarray(fn(jnp.asarray(x.astype(np.int16))))
        np.testing.assert_array_equal(gold, got)

    def test_out_frames_exact_ratio(self):
        # perfect-stream pattern: 48k->24k and 48k->12k sample counts
        for out_rate in (24000, 12000):
            r = AudioResampler(METHOD_KAISER, 48000, out_rate)
            n_in = 4800
            n_out = r.out_frames_for(n_in)
            expect = (n_in - r.n_taps) * out_rate // 48000 + 1
            assert n_out == expect


class TestAudioPipeline:
    def test_audiotestsrc_to_appsink(self):
        p = parse_launch(
            "audiotestsrc num-buffers=4 samplesperbuffer=512 ! appsink name=o")
        sink = p.get_by_name("o")
        p.run()
        s = sink.pull_sample()
        arr = np.asarray(s.buffer.data)
        assert arr.shape == (512, 1)
        assert arr.dtype == np.int16
        assert np.abs(arr.astype(int)).max() > 20000   # 0.8 * 32767 sine

    def test_audioconvert_s16_to_f32(self):
        p = parse_launch(
            "audiotestsrc num-buffers=2 ! audioconvert ! "
            "audio/x-raw,format=F32LE ! appsink name=o")
        sink = p.get_by_name("o")
        p.run()
        arr = np.asarray(sink.pull_sample().buffer.data)
        assert arr.dtype == np.float32
        assert np.abs(arr).max() <= 1.0

    def test_audioconvert_channels(self):
        p = parse_launch(
            "audiotestsrc num-buffers=1 ! audio/x-raw,channels=2 ! "
            "audioconvert ! audio/x-raw,channels=1 ! appsink name=o")
        sink = p.get_by_name("o")
        p.run()
        arr = np.asarray(sink.pull_sample().buffer.data)
        assert arr.shape[1] == 1

    def test_full_asr_frontend_chain(self):
        # BASELINE configs[1]: 48k stereo S16 -> 16k mono F32
        p = parse_launch(
            "audiotestsrc num-buffers=4 samplesperbuffer=4800 ! "
            "audio/x-raw,format=S16LE,rate=48000,channels=2 ! "
            "audioconvert ! audio/x-raw,channels=1 ! audioresample ! "
            "audio/x-raw,rate=16000 ! audioconvert ! "
            "audio/x-raw,format=F32LE ! appsink name=o")
        sink = p.get_by_name("o")
        p.run()
        total = 0
        while (s := sink.pull_sample()) is not None:
            arr = np.asarray(s.buffer.data)
            assert arr.dtype == np.float32
            assert arr.shape[1] == 1
            total += arr.shape[0]
        # 4*4800 input samples @48k -> ~6400 @16k (minus filter history)
        assert 6000 <= total <= 6400

    def test_volume(self):
        p = parse_launch(
            "audiotestsrc num-buffers=1 wave=square ! volume volume=0.5 ! "
            "appsink name=o")
        sink = p.get_by_name("o")
        p.run()
        arr = np.asarray(sink.pull_sample().buffer.data)
        peak = np.abs(arr.astype(int)).max()
        assert abs(peak - 0.4 * 32767) < 200   # 0.8 default amp * 0.5


class TestAudioMix:
    def test_audiomixer_two_sines(self):
        p = parse_launch(
            "audiomixer name=m ! appsink name=o "
            "audiotestsrc num-buffers=1 freq=440 volume=0.3 ! m.sink_0 "
            "audiotestsrc num-buffers=1 freq=440 volume=0.3 ! m.sink_1")
        sink = p.get_by_name("o")
        p.run()
        arr = np.asarray(sink.pull_sample().buffer.data)
        # two identical sines sum: peak ~ 2*0.3*32767
        assert abs(np.abs(arr.astype(int)).max() - 2 * 0.3 * 32767) < 800

    def test_audiomixer_saturates(self):
        p = parse_launch(
            "audiomixer name=m ! appsink name=o "
            "audiotestsrc num-buffers=1 wave=square volume=1.0 ! m.sink_0 "
            "audiotestsrc num-buffers=1 wave=square volume=1.0 ! m.sink_1")
        sink = p.get_by_name("o")
        p.run()
        arr = np.asarray(sink.pull_sample().buffer.data)
        assert arr.max() == 32766 or arr.max() == 32767   # clipped
        assert arr.min() == -32768

    def test_audiointerleave(self):
        p = parse_launch(
            "audiointerleave name=i ! appsink name=o "
            "audiotestsrc num-buffers=1 volume=0.5 ! audio/x-raw,channels=1 ! i.sink_0 "
            "audiotestsrc num-buffers=1 wave=silence ! audio/x-raw,channels=1 ! i.sink_1")
        sink = p.get_by_name("o")
        p.run()
        arr = np.asarray(sink.pull_sample().buffer.data)
        assert arr.shape[1] == 2
        assert np.abs(arr[:, 1]).max() == 0
        assert np.abs(arr[:, 0].astype(int)).max() > 10000

    def test_harness_volume(self):
        from gstreamer_tpu.check import Harness
        h = Harness("volume", volume=0.5)
        h.set_caps("audio/x-raw,format=S16LE,rate=48000,channels=1")
        x = (np.ones((100, 1)) * 10000).astype(np.int16)
        out = h.push(x)
        v = np.asarray(out)
        assert abs(int(v[0, 0]) - 5000) <= 1

    def test_audiorate_gap_fill(self):
        from gstreamer_tpu.core.element import element_factory_make
        from gstreamer_tpu.core.buffer import Buffer
        ar = element_factory_make("audiorate", tolerance=0)
        from gstreamer_tpu.core.caps import Caps
        ar.set_info(Caps.from_string("audio/x-raw,format=S16LE,rate=1000,channels=1"),
                    Caps.from_string("audio/x-raw,format=S16LE,rate=1000,channels=1"))
        ar.start()
        b1 = Buffer(data=np.ones((100, 1), np.int16), pts=0)
        out1 = ar.host_process(b1)
        assert out1.data.shape[0] == 100
        # 50ms gap at rate 1000 = 50 missing samples
        b2 = Buffer(data=np.ones((100, 1), np.int16), pts=150_000_000)
        out2 = ar.host_process(b2)
        assert out2.data.shape[0] == 150
        assert ar.add_samples == 50


class TestFFT:
    def test_fft_roundtrip(self):
        from gstreamer_tpu.audio.fft import FFT
        f = FFT(256)
        x = np.sin(2 * np.pi * 8 * np.arange(256) / 256)
        spec = f.fft(np, x)
        assert spec.shape == (129,)
        assert np.abs(spec).argmax() == 8
        back = f.ifft(np, spec) / 256
        np.testing.assert_allclose(back, x, atol=1e-12)

    def test_windows(self):
        from gstreamer_tpu.audio import fft as fft_mod
        for kind in (fft_mod.WINDOW_HAMMING, fft_mod.WINDOW_HANN,
                     fft_mod.WINDOW_BARTLETT, fft_mod.WINDOW_BLACKMAN):
            w = fft_mod.window(np, 64, kind)
            assert w.shape == (64,)
            assert w.max() <= 1.0 + 1e-9


class TestWavAndFx:
    def test_wav_roundtrip(self, tmp_path):
        out = tmp_path / "t.wav"
        p = parse_launch(
            f"audiotestsrc num-buffers=4 samplesperbuffer=1000 freq=500 ! "
            f"wavenc location={out}")
        p.run()
        assert out.stat().st_size == 44 + 4 * 1000 * 2
        p2 = parse_launch(f"wavparse location={out} ! appsink name=o")
        sink = p2.get_by_name("o")
        p2.run()
        total = 0
        while (s := sink.pull_sample()) is not None:
            total += np.asarray(s.buffer.data).shape[0]
            rate_caps = s.caps
        assert total == 4000
        assert rate_caps[0]["rate"] == 44100

    def test_audioamplify(self):
        p = parse_launch(
            "audiotestsrc num-buffers=1 wave=square volume=0.4 ! "
            "audioamplify amplification=2.0 ! appsink name=o")
        sink = p.get_by_name("o")
        p.run()
        arr = np.asarray(sink.pull_sample().buffer.data)
        peak = np.abs(arr.astype(int)).max()
        assert abs(peak - 0.8 * 32767) < 400

    def test_audioinvert_full(self):
        p = parse_launch(
            "audiotestsrc num-buffers=1 ! audioinvert degree=1.0 ! "
            "appsink name=o")
        sink = p.get_by_name("o")
        p.run()
        # degree 1.0 -> inverted waveform (starts negative for sine)
        arr = np.asarray(sink.pull_sample().buffer.data)
        assert arr[0, 0] <= 0

    def test_audioecho(self):
        p = parse_launch(
            "audiotestsrc num-buffers=2 samplesperbuffer=1000 wave=ticks ! "
            "audioecho delay=100000000 intensity=0.5 ! appsink name=o")
        sink = p.get_by_name("o")
        p.run()
        assert sink.pull_sample() is not None

    def test_level_messages(self):
        p = parse_launch(
            "audiotestsrc num-buffers=5 samplesperbuffer=1024 volume=0.5 "
            "! level name=l ! fakesink")
        p.run()
        lvl = p.get_by_name("l")
        # sine at 0.5 amplitude: rms = 0.5/sqrt(2) -> about -9 dB
        assert abs(lvl.last_rms[0] - 20 * np.log10(0.5 / np.sqrt(2))) < 0.5
        msg = p.bus.pop_filtered("element")
        assert msg is not None and "rms" in msg.data

    def test_spectrum_peak(self):
        p = parse_launch(
            "audiotestsrc num-buffers=2 samplesperbuffer=4410 freq=4306.64 ! "
            "spectrum name=s bands=129 ! fakesink")
        p.run()
        s = p.get_by_name("s")
        mags = np.asarray(s.last_magnitudes)[0]
        # 4306.64 Hz at 44.1k with nfft 256: bin = 4306.64*256/44100 = 25
        assert mags.argmax() == 25


class TestNoiseShaping:
    """audio-quantize.c noise shaping (:200 error-feedback, :240 shaped)."""

    def _gold_feedback(self, s, dith, mask):
        # scalar transliteration of quantize_int_dither_feedback
        out = np.empty_like(s)
        e = np.zeros(s.shape[1], np.int64)
        for i in range(s.shape[0]):
            for ch in range(s.shape[1]):
                o = int(s[i, ch])
                err = int(dith[i, ch]) - int(e[ch])
                v = max(-(1 << 31), min((1 << 31) - 1, o + err))
                v &= ~mask
                e[ch] = e[ch] + (v - o)
                out[i, ch] = v
        return out

    def test_error_feedback_matches_gold(self):
        from gstreamer_tpu.audio.quantize import Quantizer
        rng = np.random.RandomState(0)
        s = rng.randint(-(1 << 30), 1 << 30, (64, 2)).astype(np.int64)
        q1 = Quantizer("tpdf", 16, 2, ns="error-feedback", seed=123)
        out = q1._apply_ns(s.astype(np.int32))
        q2 = Quantizer("tpdf", 16, 2, seed=123)
        dith = q2.dither_buf(64).astype(np.int64)
        gold = self._gold_feedback(s, dith, (1 << 16) - 1)
        assert np.array_equal(out.astype(np.int64), gold)

    def _gold_shaped(self, s, dith, mask, coeffs):
        SHIFT, REDUCE, RROUND, SREDUCE, SROUND = 10, 8, 128, 2, 2
        c = [int(np.floor(x * (1 << SHIFT) + 0.5)) for x in coeffs]
        nc = len(c)
        ch_n = s.shape[1]
        e = np.zeros((s.shape[0] + nc, ch_n), np.int64)
        out = np.empty_like(s)
        for i in range(s.shape[0]):
            for ch in range(ch_n):
                err = 0
                for j in range(nc):
                    err -= int(e[i + j, ch]) * c[j]
                err = (err + SROUND) >> SREDUCE
                v = max(-(1 << 31), min((1 << 31) - 1, int(s[i, ch]) + err))
                o = v
                v = max(-(1 << 31), min((1 << 31) - 1, v + int(dith[i, ch])))
                v &= ~mask
                e[i + nc, ch] = (v - o + RROUND) >> REDUCE
                out[i, ch] = v
        return out

    @pytest.mark.parametrize("ns,coeffs", [
        ("simple", [-0.5, 1.0]),
        ("medium", [0.6149, -1.590, 1.959, -2.165, 2.033]),
        ("high", [-0.340122, 0.876066, -1.72008, 2.61339, -3.31399,
                  3.27918, -2.92975, 2.08484]),
    ])
    def test_shaped_matches_gold(self, ns, coeffs):
        from gstreamer_tpu.audio.quantize import Quantizer
        rng = np.random.RandomState(1)
        s = rng.randint(-(1 << 28), 1 << 28, (48, 2)).astype(np.int64)
        q1 = Quantizer("tpdf", 16, 2, ns=ns, seed=77)
        out = q1._apply_ns(s.astype(np.int32))
        q2 = Quantizer("tpdf", 16, 2, seed=77)
        dith = q2.dither_buf(48).astype(np.int64)
        gold = self._gold_shaped(s, dith, (1 << 16) - 1, coeffs)
        assert np.array_equal(out.astype(np.int64), gold)

    def test_audioconvert_noise_shaping_pipeline(self):
        from gstreamer_tpu.core.parse import parse_launch
        pipe = parse_launch(
            "audiotestsrc wave=sine num-buffers=2 samplesperbuffer=256 ! "
            "audio/x-raw,format=S32LE,rate=44100,channels=1 ! "
            "audioconvert noise-shaping=high dithering=tpdf ! "
            "audio/x-raw,format=S16LE ! appsink name=o")
        pipe.run()
        s = pipe.get_by_name("o").pull_sample()
        x = np.asarray(s.buffer.data)
        assert x.dtype == np.int16 and x.size > 0
        # shaped output should not be identical to plain truncation
        assert int(np.abs(x.astype(int)).max()) > 0


class TestEqualizer:
    def test_band_layout_3bands(self):
        from gstreamer_tpu.audio.equalizer import make_bands
        b = make_bands(3)
        # step = 10: bands at 110/1100/11000 Hz (gstiirequalizer3bands.c
        # property blurbs)
        assert abs(b[0].freq - 110.0) < 1e-9
        assert abs(b[1].freq - 1100.0) < 1e-9
        assert abs(b[2].freq - 11000.0) < 1e-9
        assert b[0].type == "low-shelf" and b[2].type == "high-shelf"

    def test_peak_filter_coefficients(self):
        from gstreamer_tpu.audio.equalizer import Band
        import math
        b = Band(freq=1000.0, width=200.0, gain=6.0, type="peak")
        b.setup(44100)
        gain = 10 ** (6.0 / 40)
        omega = 2 * math.pi * 1000.0 / 44100
        alpha = math.tan(2 * math.pi * (200.0 / 44100) / 2)
        b0 = 1 + alpha / gain
        assert abs(b.a0 - (1 + alpha * gain) / b0) < 1e-12
        assert abs(b.b1 - (2 * math.cos(omega)) / b0) < 1e-12

    def test_zero_gain_passthrough(self):
        from gstreamer_tpu.core.parse import parse_launch
        pipe = parse_launch(
            "audiotestsrc wave=sine num-buffers=1 samplesperbuffer=256 ! "
            "audio/x-raw,format=F64LE,rate=44100,channels=1 ! "
            "equalizer-3bands ! appsink name=o")
        pipe.run()
        y = np.asarray(pipe.get_by_name("o").pull_sample().buffer.data)
        pipe2 = parse_launch(
            "audiotestsrc wave=sine num-buffers=1 samplesperbuffer=256 ! "
            "audio/x-raw,format=F64LE,rate=44100,channels=1 ! appsink name=o")
        pipe2.run()
        x = np.asarray(pipe2.get_by_name("o").pull_sample().buffer.data)
        assert np.array_equal(x, y)

    def test_boost_low_band_amplifies_low_freq(self):
        from gstreamer_tpu.core.parse import parse_launch
        # 100 Hz tone boosted by band0=+12dB
        pipe = parse_launch(
            "audiotestsrc wave=sine freq=100 num-buffers=4 "
            "samplesperbuffer=4096 ! "
            "audio/x-raw,format=F64LE,rate=44100,channels=1 ! "
            "equalizer-3bands band0=12.0 ! appsink name=o")
        pipe.run()
        sink = pipe.get_by_name("o")
        chunks = []
        while True:
            s = sink.pull_sample()
            if s is None:
                break
            chunks.append(np.asarray(s.buffer.data))
        y = np.concatenate(chunks)[-4096:]
        rms = float(np.sqrt((y ** 2).mean()))
        # +12 dB ~ 4x amplitude on a band-centered-ish tone; loose bound
        assert rms > 1.5 * 0.8 / np.sqrt(2)

    def test_s16_path_clamps(self):
        from gstreamer_tpu.core.parse import parse_launch
        pipe = parse_launch(
            "audiotestsrc wave=square volume=1.0 freq=100 num-buffers=2 "
            "samplesperbuffer=2048 ! "
            "audio/x-raw,format=S16LE,rate=44100,channels=2 ! "
            "equalizer-10bands band0=12.0 band1=12.0 ! appsink name=o")
        pipe.run()
        y = np.asarray(pipe.get_by_name("o").pull_sample().buffer.data)
        assert y.dtype == np.int16
        assert int(y.max()) <= 32767


class TestAudioPanorama:
    def _run(self, desc):
        from gstreamer_tpu.core.parse import parse_launch
        pipe = parse_launch(desc)
        pipe.run()
        return np.asarray(pipe.get_by_name("o").pull_sample().buffer.data)

    def test_mono_center_psy_splits_half(self):
        y = self._run(
            "audiotestsrc wave=sine num-buffers=1 samplesperbuffer=64 ! "
            "audio/x-raw,format=F32LE,rate=44100,channels=1 ! "
            "audiopanorama panorama=0.0 ! appsink name=o")
        assert y.shape[-1] == 2
        assert np.allclose(y[:, 0], y[:, 1])
        x = self._run(
            "audiotestsrc wave=sine num-buffers=1 samplesperbuffer=64 ! "
            "audio/x-raw,format=F32LE,rate=44100,channels=1 ! appsink name=o")
        assert np.allclose(y[:, 0], x[:, 0] * np.float32(0.5))

    def test_stereo_psy_right_crossfeeds(self):
        y = self._run(
            "audiotestsrc wave=sine num-buffers=1 samplesperbuffer=64 ! "
            "audio/x-raw,format=F32LE,rate=44100,channels=2 ! "
            "audiopanorama panorama=0.5 ! appsink name=o")
        x = self._run(
            "audiotestsrc wave=sine num-buffers=1 samplesperbuffer=64 ! "
            "audio/x-raw,format=F32LE,rate=44100,channels=2 ! appsink name=o")
        L, R = x[:, 0].astype(np.float32), x[:, 1].astype(np.float32)
        assert np.allclose(y[:, 0], L * np.float32(0.5))
        assert np.allclose(y[:, 1], R + L * np.float32(0.5))

    def test_simple_mode_attenuates_only(self):
        y = self._run(
            "audiotestsrc wave=sine num-buffers=1 samplesperbuffer=64 ! "
            "audio/x-raw,format=F32LE,rate=44100,channels=2 ! "
            "audiopanorama panorama=1.0 method=simple ! appsink name=o")
        assert np.allclose(y[:, 0], 0.0)


class TestWSincFilters:
    def _spectrum(self, y, rate):
        f = np.fft.rfft(y * np.hanning(len(y)))
        freqs = np.fft.rfftfreq(len(y), 1.0 / rate)
        return freqs, np.abs(f)

    def _tone_through(self, desc, freq):
        from gstreamer_tpu.core.parse import parse_launch
        pipe = parse_launch(
            f"audiotestsrc wave=sine freq={freq} num-buffers=4 "
            f"samplesperbuffer=2048 ! "
            f"audio/x-raw,format=F64LE,rate=44100,channels=1 ! "
            f"{desc} ! appsink name=o")
        pipe.run()
        sink = pipe.get_by_name("o")
        parts = []
        while True:
            s = sink.pull_sample()
            if s is None:
                break
            parts.append(np.asarray(s.buffer.data)[:, 0])
        return np.concatenate(parts)[-4096:]

    def test_lowpass_attenuates_high(self):
        lo = self._tone_through("audiowsinclimit cutoff=2000 length=101",
                                440)
        hi = self._tone_through("audiowsinclimit cutoff=2000 length=101",
                                10000)
        assert np.sqrt((lo ** 2).mean()) > 0.5
        assert np.sqrt((hi ** 2).mean()) < 0.05

    def test_highpass_inverts(self):
        hi = self._tone_through(
            "audiowsinclimit cutoff=2000 length=101 mode=high-pass", 10000)
        lo = self._tone_through(
            "audiowsinclimit cutoff=2000 length=101 mode=high-pass", 100)
        assert np.sqrt((hi ** 2).mean()) > 0.5
        assert np.sqrt((lo ** 2).mean()) < 0.05

    def test_bandpass_kernel_dc_behaviour(self):
        pass_band = self._tone_through(
            "audiowsincband lower-frequency=500 upper-frequency=3000 "
            "length=101", 1000)
        stop = self._tone_through(
            "audiowsincband lower-frequency=500 upper-frequency=3000 "
            "length=101", 10000)
        assert np.sqrt((pass_band ** 2).mean()) > 0.4
        assert np.sqrt((stop ** 2).mean()) < 0.08

    def test_kernel_matches_reference_formula(self):
        from gstreamer_tpu.elements.audiofx import _sinc_kernel
        import math
        ln, rate, cutoff = 9, 8000, 1000
        k = _sinc_kernel(cutoff, rate, ln, "hamming")
        w = 2 * math.pi * cutoff / rate
        gold = []
        for i in range(ln):
            if i == (ln - 1) / 2.0:
                v = w
            else:
                v = math.sin(w * (i - (ln - 1) / 2)) / (i - (ln - 1) / 2.0)
            v *= 0.54 - 0.46 * math.cos(2 * math.pi * i / (ln - 1))
            gold.append(v)
        gold = np.array(gold)
        gold /= gold.sum()
        assert np.allclose(k, gold, atol=1e-15)


class TestInterpolatedFilterMode:
    def test_auto_heuristic(self):
        from gstreamer_tpu.audio.resampler import AudioResampler
        # kaiser 44100->48000: memory 4*n_taps*48000 >> 1MiB -> interpolated
        r = AudioResampler("kaiser", 44100, 48000)
        assert r.effective_filter_mode == "interpolated"
        # tiny out rate -> full
        r2 = AudioResampler("kaiser", 16000, 8000, filter_mode="full")
        assert r2.effective_filter_mode == "full"
        # linear method: 4*2*48000 < 1MiB -> full
        r3 = AudioResampler("linear", 44100, 48000)
        assert r3.effective_filter_mode == "full"

    def test_interpolated_taps_close_to_full(self):
        from gstreamer_tpu.audio.resampler import AudioResampler
        ri = AudioResampler("kaiser", 44100, 48000)
        rf = AudioResampler("kaiser", 44100, 48000, filter_mode="full")
        # cubic-interpolated taps approximate the directly-computed ones
        wi = ri.taps_f64 / ri.taps_f64.sum(axis=1, keepdims=True)
        wf = rf.taps_f64 / rf.taps_f64.sum(axis=1, keepdims=True)
        assert np.abs(wi - wf).max() < 2e-4

    def test_huge_phase_count_feasible(self):
        from gstreamer_tpu.audio.resampler import AudioResampler
        import time
        t0 = time.time()
        r = AudioResampler("kaiser", 44100, 44101)
        assert r.effective_filter_mode == "interpolated"
        assert r.n_phases == 44101
        assert r.taps_f64.shape[0] == 44101
        assert time.time() - t0 < 30

    def test_int_taps_match_full_mode_quantization(self):
        from gstreamer_tpu.audio.resampler import AudioResampler
        r = AudioResampler("kaiser", 44100, 48000)
        rf = AudioResampler("kaiser", 44100, 48000, filter_mode="full")
        t16 = r.taps_for("s16").astype(np.int64)
        tf = rf.taps_for("s16").astype(np.int64)
        # same DC quantization targets as the directly-computed bank
        assert set(np.unique(t16.sum(axis=1))) == \
            set(np.unique(tf.sum(axis=1)))
        assert np.abs(t16 - tf).max() <= 4

    def test_resample_matches_full_mode(self):
        from gstreamer_tpu.audio.resampler import AudioResampler
        r = AudioResampler("kaiser", 44100, 48000)
        rf = AudioResampler("kaiser", 44100, 48000, filter_mode="full")
        n = 4096
        t = np.arange(n) / 44100.0
        x = np.sin(2 * np.pi * 440.0 * t)[:, None].astype(np.float64)
        m = r.out_frames_for(n)
        y = np.asarray(r.resample_ref(x, m))
        yf = np.asarray(rf.resample_ref(x, m))
        assert np.abs(y - yf).max() < 1e-5
