"""ReplayGain family + cutter: scalar-gold parity for the analyzer,
gain-determination logic for rgvolume, tanh limiter, silence gate."""

import math

import numpy as np
import pytest

from gstreamer_tpu.audio.rganalysis import (ABUTTER, AYULE, BBUTTER,
                                            BYULE, PINK_REF,
                                            RgAnalysisCtx, SAMPLE_RATES)
from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch


def gold_rg_gain(samples, rate):
    """Scalar float64 transliteration of rganalysis.c: sequential IIR
    + 50ms windows + histogram 95th percentile."""
    idx = SAMPLE_RATES.index(rate)
    ay, by = AYULE[idx], BYULE[idx]
    ab, bb = ABUTTER[idx], BBUTTER[idx]
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.shape[1] == 1:
        samples = np.repeat(samples, 2, axis=1)
    x = samples * 32768.0
    n = len(x)
    step = np.zeros_like(x)
    out = np.zeros_like(x)
    hist = np.zeros(12000, np.uint32)
    win_n = (rate * 50 + 999) // 1000
    # IIR with zero initial state (fresh context)
    for c in range(2):
        xs = x[:, c]
        st = np.zeros(n)
        ot = np.zeros(n)
        for i in range(n):
            acc = 1e-10
            for k in range(11):
                acc += by[k] * (xs[i - k] if i - k >= 0 else 0.0)
                if k >= 1:
                    acc -= ay[k] * (st[i - k] if i - k >= 0 else 0.0)
            st[i] = acc
            acc2 = 0.0
            for k in range(3):
                acc2 += bb[k] * (st[i - k] if i - k >= 0 else 0.0)
                if k >= 1:
                    acc2 -= ab[k] * (ot[i - k] if i - k >= 0 else 0.0)
            ot[i] = acc2
        out[:, c] = ot
    sq = (out ** 2).sum(axis=1)
    nwin = n // win_n
    for w in range(nwin):
        msq = sq[w * win_n:(w + 1) * win_n].sum()
        val = 100 * 10 * math.log10(msq / win_n * 0.5 + 1e-37)
        hist[min(max(int(val), 0), 11999)] += 1
    total = hist.sum()
    # C: ceil(sum * (1. - 95/100.)) — the subtraction yields
    # 0.050000000000000044, which rounds the count UP one extra
    upper = math.ceil(total * (1.0 - 95 / 100.0))
    for i in range(11999, -1, -1):
        if upper <= hist[i]:
            break
        upper -= hist[i]
    return PINK_REF - i / 100.0


class TestAnalysisGold:
    @pytest.mark.parametrize("rate", [8000, 44100])
    def test_sine_matches_scalar_gold(self, rate):
        t = np.arange(rate) / rate          # 1 second
        x = (0.25 * np.sin(2 * np.pi * 1000 * t)).astype(np.float64)
        want = gold_rg_gain(x.copy(), rate)
        ctx = RgAnalysisCtx()
        assert ctx.set_sample_rate(rate)
        # push in uneven chunks to exercise state carry
        for lo in range(0, rate, 1234):
            ctx.analyze(x[lo:lo + 1234])
        gain, peak = ctx.track_result()
        assert abs(gain - want) <= 0.02     # one histogram step
        assert abs(peak - 0.25) < 1e-4   # sine sampling misses the crest

    def test_louder_means_less_gain(self):
        rate = 8000
        t = np.arange(rate) / rate
        ctx = RgAnalysisCtx()
        ctx.set_sample_rate(rate)
        ctx.analyze(0.05 * np.sin(2 * np.pi * 440 * t))
        quiet_gain, _ = ctx.track_result()
        ctx.analyze(0.5 * np.sin(2 * np.pi * 440 * t))
        loud_gain, _ = ctx.track_result()
        assert quiet_gain - loud_gain == pytest.approx(20.0, abs=0.05)

    def test_album_accumulation(self):
        rate = 8000
        t = np.arange(rate) / rate
        ctx = RgAnalysisCtx()
        ctx.set_sample_rate(rate)
        ctx.analyze(0.1 * np.sin(2 * np.pi * 440 * t))
        g1, p1 = ctx.track_result()
        ctx.analyze(0.4 * np.sin(2 * np.pi * 440 * t))
        g2, p2 = ctx.track_result()
        ag, ap = ctx.album_result()
        assert ap == pytest.approx(max(p1, p2), abs=1e-9)
        assert min(g1, g2) - 1e-9 <= ag <= max(g1, g2) + 1e-9

    def test_unsupported_rate_rejected(self):
        assert not RgAnalysisCtx().set_sample_rate(44000)


class TestRgElements:
    def test_rganalysis_posts_tags_on_eos(self):
        p = parse_launch(
            "audiotestsrc num-buffers=20 samplesperbuffer=2205 "
            "wave=sine ! audio/x-raw,format=F32LE,rate=44100,channels=2 "
            "! rganalysis ! fakesink")
        p.run()
        msgs = []
        while (m := p.bus.pop()) is not None:
            if m.type == "tag":
                msgs.append(m)
        assert msgs
        tags = msgs[-1].data
        assert "replaygain-track-gain" in tags
        assert tags["replaygain-reference-level"] == 89.0
        assert 0 < tags["replaygain-track-peak"] <= 1.0

    def test_rgvolume_gain_determination(self):
        from gstreamer_tpu.core.element import element_factory_make
        el = element_factory_make("rgvolume")
        # no tags: fallback + pre-amp
        el.props["fallback-gain"] = -3.0
        el.props["pre-amp"] = 1.0
        el._determine_gain()
        assert el.result_gain == pytest.approx(-2.0)
        # track tags with peak limiting (gstrgvolume.c:684-687)
        el._tags = {"replaygain-track-gain": 12.0,
                    "replaygain-track-peak": 0.5}
        el.props["album-mode"] = False
        el.props["pre-amp"] = 0.0
        el._determine_gain()
        assert el.target_gain == pytest.approx(12.0)
        # 20log10(0.5)+12 = 5.98 > 0 headroom -> 20log10(2.0)
        assert el.result_gain == pytest.approx(20 * math.log10(2.0))
        # album preferred in album mode
        el._tags["replaygain-album-gain"] = 2.0
        el._tags["replaygain-album-peak"] = 0.1
        el.props["album-mode"] = True
        el._determine_gain()
        assert el.target_gain == pytest.approx(2.0)
        assert el.result_gain == pytest.approx(2.0)

    def test_rganalysis_to_rgvolume_pipeline(self):
        """Tags flow from the analyzer into rgvolume downstream."""
        p = parse_launch(
            "audiotestsrc num-buffers=10 samplesperbuffer=4410 "
            "wave=sine volume=0.1 "
            "! audio/x-raw,format=F32LE,rate=44100,channels=2 "
            "! rganalysis ! rgvolume album-mode=false ! fakesink")
        p.run()
        rgv = [e for e in p.elements if e.FACTORY == "rgvolume"][0]
        assert "replaygain-track-gain" in rgv._tags

    def test_rglimiter_tanh(self):
        x = np.array([[0.2], [0.7], [-0.9], [1.5]], np.float32)
        p = parse_launch(
            "appsrc name=in ! audio/x-raw,format=F32LE,rate=8000,"
            "channels=1 ! rglimiter ! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(data=x))
        p.get_by_name("in").end_of_stream()
        p.run()
        got = np.asarray(p.get_by_name("out").pull_sample().buffer.data)
        gold = x.copy()
        for i in range(len(gold)):
            v = float(gold[i, 0])
            if v > 0.5:
                gold[i, 0] = np.float32(
                    math.tanh((v - 0.5) / 0.5) * 0.5 + 0.5)
            elif v < -0.5:
                gold[i, 0] = np.float32(
                    math.tanh((v + 0.5) / 0.5) * 0.5 - 0.5)
        np.testing.assert_allclose(got, gold, atol=2e-7)
        assert np.abs(got).max() < 1.0


class TestCutter:
    def _run(self, bufs, rate=8000, **props):
        propstr = " ".join(f"{k}={v}" for k, v in props.items())
        p = parse_launch(
            f"appsrc name=in ! audio/x-raw,format=S16LE,rate={rate},"
            f"channels=1 ! cutter {propstr} ! appsink name=out")
        src = p.get_by_name("in")
        for b in bufs:
            src.push_buffer(Buffer(data=b))
        src.end_of_stream()
        p.run()
        outs = []
        sink = p.get_by_name("out")
        while (s := sink.pull_sample()) is not None:
            outs.append(np.asarray(s.buffer.data))
        msgs = []
        while (m := p.bus.pop()) is not None:
            if m.type == "element" and m.data.get("name") == "cutter":
                msgs.append(m)
        return outs, msgs

    def test_silence_suppressed_loud_passes(self):
        rate = 8000
        silent = np.zeros((rate // 10, 1), np.int16)          # 100ms
        loud = (np.ones((rate // 10, 1)) * 16000).astype(np.int16)
        # leaky: silence dropped entirely after pre-buffer trim
        outs, msgs = self._run([silent] * 10 + [loud] * 3,
                               **{"run-length": 0, "pre-length": 0,
                                  "leaky": "true"})
        total = sum(len(o) for o in outs)
        assert total == 3 * (rate // 10)
        # one silence->active transition message with above=True
        assert any(m.data["above"] for m in msgs)

    def test_pre_buffer_flushed_on_attack(self):
        rate = 8000
        silent = np.zeros((rate // 10, 1), np.int16)
        loud = (np.ones((rate // 10, 1)) * 16000).astype(np.int16)
        # 200ms pre-length: the last 2 silent buffers are replayed
        outs, _ = self._run([silent] * 5 + [loud],
                            **{"run-length": 0, "leaky": "true",
                               "pre-length": 200_000_000})
        total = sum(len(o) for o in outs)
        assert total == 3 * (rate // 10)   # 2 pre-rolled + 1 loud

    def test_run_length_hysteresis(self):
        rate = 8000
        silent = np.zeros((rate // 10, 1), np.int16)
        loud = (np.ones((rate // 10, 1)) * 16000).astype(np.int16)
        # 500ms run-length: 3 silent buffers (300ms) stay "active"
        outs, msgs = self._run(
            [loud, silent, silent, silent, loud],
            **{"run-length": 500_000_000, "leaky": "true",
               "pre-length": 0})
        total = sum(len(o) for o in outs)
        assert total == 5 * (rate // 10)   # nothing cut
        assert not any(not m.data["above"] for m in msgs)
