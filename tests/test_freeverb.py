"""freeverb: scalar float32 gold parity (tolerance: XLA FMA) +
behavior."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.freeverb import (ALLPASS_TUNINGS,
                                             COMB_TUNINGS, DC_OFFSET,
                                             FIXED_GAIN, OFFSET_ROOM,
                                             SCALE_ROOM, STEREO_SPREAD)

F = np.float32


class GoldFreeverb:
    """Scalar transliteration of gstfreeverb.c (float32)."""

    def __init__(self, rate, room_size=0.5, damping=0.2, width=1.0,
                 level=0.5):
        srf = F(rate) / F(44100.0)
        self.combL = [self._comb(int(F(t) * srf))
                      for t in COMB_TUNINGS]
        self.combR = [self._comb(int(F(t + STEREO_SPREAD) * srf))
                      for t in COMB_TUNINGS]
        self.apL = [self._ap(int(F(t) * srf))
                    for t in ALLPASS_TUNINGS]
        self.apR = [self._ap(int(F(t + STEREO_SPREAD) * srf))
                    for t in ALLPASS_TUNINGS]
        self.feedback = F(room_size) * SCALE_ROOM + OFFSET_ROOM
        self.damp1 = F(damping)
        self.damp2 = F(1.0) - self.damp1
        wet = F(level)
        self.wet1 = wet * (F(width) / F(2.0) + F(0.5))
        self.wet2 = wet * ((F(1.0) - F(width)) / F(2.0))
        self.dry = F(1.0) - F(level)

    @staticmethod
    def _comb(n):
        return {"buf": np.full(max(n, 1), DC_OFFSET, np.float32),
                "idx": 0, "fs": F(0.0)}

    @staticmethod
    def _ap(n):
        return {"buf": np.full(max(n, 1), DC_OFFSET, np.float32),
                "idx": 0}

    def _comb_process(self, c, x):
        tmp = c["buf"][c["idx"]]
        c["fs"] = F(tmp * self.damp2 + c["fs"] * self.damp1)
        c["buf"][c["idx"]] = F(x + c["fs"] * self.feedback)
        c["idx"] = (c["idx"] + 1) % len(c["buf"])
        return tmp

    def _ap_process(self, a, x):
        bufout = a["buf"][a["idx"]]
        out = F(bufout - x)
        a["buf"][a["idx"]] = F(x + bufout * F(0.5))
        a["idx"] = (a["idx"] + 1) % len(a["buf"])
        return out

    def process_mono(self, xs):
        out = np.zeros((len(xs), 2), np.float32)
        for k, v in enumerate(xs):
            in2 = F(v)
            in1 = F((F(2.0) * in2 + DC_OFFSET) * FIXED_GAIN)
            ol = F(0.0)
            orr = F(0.0)
            for c in self.combL:
                ol = F(ol + self._comb_process(c, in1))
            for c in self.combR:
                orr = F(orr + self._comb_process(c, in1))
            for a in self.apL:
                ol = self._ap_process(a, ol)
            for a in self.apR:
                orr = self._ap_process(a, orr)
            ol = F(ol - DC_OFFSET)
            orr = F(orr - DC_OFFSET)
            out[k, 0] = F(ol * self.wet1 + orr * self.wet2
                          + in2 * self.dry)
            out[k, 1] = F(orr * self.wet1 + ol * self.wet2
                          + in2 * self.dry)
        return out


class TestFreeverb:
    def test_matches_scalar_gold(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(2000).astype(np.float32) * 0.3
        p = parse_launch(
            "appsrc name=in ! audio/x-raw,format=F32LE,rate=44100,"
            "channels=1 ! freeverb ! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(data=x[:, None]))
        p.get_by_name("in").end_of_stream()
        p.run()
        got = np.asarray(p.get_by_name("out").pull_sample().buffer.data)
        want = GoldFreeverb(44100).process_mono(x)
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)

    def test_state_carries_across_chunks(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal(3000).astype(np.float32) * 0.2
        outs = []
        p = parse_launch(
            "appsrc name=in ! audio/x-raw,format=F32LE,rate=44100,"
            "channels=1 ! freeverb ! appsink name=out")
        for i in range(0, 3000, 1000):
            p.get_by_name("in").push_buffer(Buffer(
                data=x[i:i + 1000, None]))
        p.get_by_name("in").end_of_stream()
        p.run()
        while (s := p.get_by_name("out").pull_sample()) is not None:
            outs.append(np.asarray(s.buffer.data))
        got = np.concatenate(outs)
        want = GoldFreeverb(44100).process_mono(x)
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)

    def test_reverb_tail_exists(self):
        # an impulse leaves energy ringing after the input ends
        x = np.zeros(6000, np.float32)
        x[0] = 0.8
        p = parse_launch(
            "appsrc name=in ! audio/x-raw,format=F32LE,rate=44100,"
            "channels=1 ! freeverb level=1.0 ! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(data=x[:, None]))
        p.get_by_name("in").end_of_stream()
        p.run()
        got = np.asarray(p.get_by_name("out").pull_sample().buffer.data)
        assert np.abs(got[3000:]).max() > 1e-4
        assert got.shape[1] == 2
