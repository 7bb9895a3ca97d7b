"""scaletempo WSOLA: bit-parity against a scalar transliteration of
gstscaletempo.c, pitch preservation, and streaming equivalence."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch


class GoldScaletempo:
    """Direct scalar port of gstscaletempo.c (float64 path),
    frame-indexed instead of byte-indexed."""

    def __init__(self, rate, channels, scale, ms_stride=30,
                 percent_overlap=0.2, ms_search=14):
        self.scale = scale
        self.stride = int(ms_stride * rate / 1000.0)
        self.overlap = int(self.stride * percent_overlap)
        self.standing = self.stride - self.overlap
        self.search = 0 if self.overlap <= 1 \
            else int(ms_search * rate / 1000.0)
        self.qmax = self.search + self.stride + self.overlap
        self.queue = np.zeros((self.qmax, channels))
        self.queued = 0
        self.ov = np.zeros((self.overlap, channels))
        self.to_slide = 0
        self.err = 0.0
        self.blend = np.arange(self.overlap) / self.overlap
        i = np.arange(1, self.overlap, dtype=np.float64)
        self.window = i * (self.overlap - i)

    def _fill(self, x, off):
        n_in = len(x) - off
        if self.to_slide > 0:
            if self.to_slide < self.queued:
                keep = self.queued - self.to_slide
                self.queue[:keep] = self.queue[self.to_slide:self.queued]
                self.queued = keep
                self.to_slide = 0
            else:
                self.to_slide -= self.queued
                skip = min(self.to_slide, n_in)
                self.queued = 0
                self.to_slide -= skip
                off += skip
                n_in -= skip
        if n_in > 0:
            nc = min(self.qmax - self.queued, n_in)
            self.queue[self.queued:self.queued + nc] = x[off:off + nc]
            self.queued += nc
            off += nc
        return off

    def _best_off(self):
        if self.search < 1:
            return 0
        pre = self.window[:, None] * self.ov[1:]
        best = float(-(2 ** 31))
        best_off = 0
        for off in range(self.search):
            corr = float(
                (pre * self.queue[off + 1:off + self.overlap]).sum())
            if corr > best:
                best, best_off = corr, off
        return best_off

    def process(self, x):
        out = []
        off_in = self._fill(x, 0)
        while self.queued >= self.qmax:
            boff = self._best_off()
            seg = np.empty((self.overlap, x.shape[1]))
            for i in range(self.overlap):
                seg[i] = self.ov[i] - self.blend[i] * (
                    self.ov[i] - self.queue[boff + i])
            out.append(seg)
            out.append(
                self.queue[boff + self.overlap:boff + self.stride].copy())
            self.ov = self.queue[
                boff + self.stride:boff + self.stride + self.overlap].copy()
            slide = self.stride * self.scale + self.err
            whole = int(slide)
            self.to_slide = whole
            self.err = slide - whole
            off_in = self._fill(x, off_in)
        return (np.concatenate(out, axis=0) if out
                else np.zeros((0, x.shape[1])))


def _run_element(x, rate, scale, chunks=4, fmt="F64LE"):
    p = parse_launch(
        f"appsrc name=in ! audio/x-raw,format={fmt},rate={rate},"
        f"channels={x.shape[1]} ! scaletempo rate={scale} "
        f"! appsink name=out")
    src = p.get_by_name("in")
    step = len(x) // chunks
    for i in range(0, len(x), step):
        src.push_buffer(Buffer(data=x[i:i + step]))
    src.end_of_stream()
    p.run()
    outs = []
    sink = p.get_by_name("out")
    while (s := sink.pull_sample()) is not None:
        outs.append(np.asarray(s.buffer.data))
    return (np.concatenate(outs, axis=0) if outs
            else np.zeros((0, x.shape[1])))


class TestGoldParity:
    @pytest.mark.parametrize("scale", [0.5, 1.5, 2.0])
    @pytest.mark.parametrize("channels", [1, 2])
    def test_float64_bit_parity(self, scale, channels):
        rng = np.random.default_rng(42)
        rate = 8000
        x = rng.standard_normal((rate * 2, channels))
        gold = GoldScaletempo(rate, channels, scale)
        want = gold.process(x)
        got = _run_element(x, rate, scale)
        assert len(got) == len(want)
        np.testing.assert_array_equal(got, want)

    def test_chunking_invariance(self):
        """Same output regardless of input chunk sizes (state carry)."""
        rng = np.random.default_rng(3)
        x = rng.standard_normal((16000, 1))
        a = _run_element(x, 8000, 1.7, chunks=2)
        b = _run_element(x, 8000, 1.7, chunks=16)
        np.testing.assert_array_equal(a, b)


class TestSemantics:
    def test_output_length_ratio(self):
        rng = np.random.default_rng(0)
        rate, scale = 44100, 2.0
        x = rng.standard_normal((rate * 2, 1))
        out = _run_element(x, rate, scale)
        assert abs(len(out) * scale / len(x) - 1.0) < 0.1

    def test_pitch_preserved(self):
        """440 Hz sine at 2x tempo still peaks at 440 Hz."""
        rate, scale = 44100, 2.0
        t = np.arange(rate * 2) / rate
        x = np.sin(2 * np.pi * 440 * t)[:, None]
        out = _run_element(x, rate, scale)
        n = 1 << 14
        seg = out[len(out) // 4:len(out) // 4 + n, 0]
        spec = np.abs(np.fft.rfft(seg * np.hanning(n)))
        peak_hz = np.argmax(spec) * rate / n
        assert abs(peak_hz - 440) < 15

    def test_rate_one_passthrough(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((4000, 2))
        out = _run_element(x, 8000, 1.0)
        np.testing.assert_array_equal(out, x)

    def test_s16_path(self):
        rng = np.random.default_rng(9)
        x = (rng.standard_normal((16000, 2)) * 8000).astype(np.int16)
        out = _run_element(x, 8000, 1.5, fmt="S16LE")
        assert out.dtype == np.int16
        assert abs(len(out) * 1.5 / len(x) - 1.0) < 0.15

    def test_segment_rate_overrides_property(self):
        """SEGMENT with rate != 1 sets the scale and is rewritten to
        rate=1 downstream (gstscaletempo.c:711-715)."""
        import dataclasses

        from gstreamer_tpu.core.element import element_factory_make
        from gstreamer_tpu.core.events import EventType, segment_event
        from gstreamer_tpu.core.segment import Segment

        el = element_factory_make("scaletempo")
        seg = Segment(rate=2.0)
        el.sink_event(el.sink_pads()[0], segment_event(seg))
        assert el._scale == 2.0
        # unlinked src pad: rewritten sticky segment stored on the pad
        out_ev = el.src_pads()[0].sticky[EventType.SEGMENT]
        assert out_ev.data["segment"].rate == 1.0
        assert out_ev.data["segment"].applied_rate == 2.0
