"""removesilence: VAD gold parity + element drop/squash behavior."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.removesilence import Vad


def gold_vad_power(p, samples):
    """Scalar transliteration of the Q16 power loop
    (vad_private.c:124-127)."""
    for s in samples:
        u = ((int(s) * int(s)) >> 14) & 0xFFFF
        p = (0x0800 * u + 0xF7FF * (p >> 16)
             + ((0xF7FF * (p & 0xFFFF)) >> 16))
    return p


class TestVad:
    def test_power_recursion_exact(self):
        rng = np.random.default_rng(0)
        x = (rng.standard_normal(1000) * 9000).astype(np.int16)
        v = Vad(480, -60)
        v.update(x)
        assert v.power == gold_vad_power(0, x)

    def test_power_across_chunks(self):
        rng = np.random.default_rng(1)
        x = (rng.standard_normal(600) * 5000).astype(np.int16)
        v = Vad(480, -60)
        v.update(x[:250])
        v.update(x[250:])
        assert v.power == gold_vad_power(0, x)

    def test_silence_vs_noise_states(self):
        v = Vad(480, -60)
        assert v.update(np.zeros(1000, np.int16)) == Vad.SILENCE
        rng = np.random.default_rng(2)
        # loud low-frequency-ish signal: alternate +/- slowly
        t = np.arange(4000)
        loud = (np.sin(2 * np.pi * 30 * t / 8000) * 20000).astype(
            np.int16)
        state = v.update(loud)
        assert state == Vad.VOICE
        # silence needs hysteresis samples to flip back
        assert v.update(np.zeros(100, np.int16)) == Vad.VOICE
        assert v.update(np.zeros(1000, np.int16)) == Vad.SILENCE


class TestRemoveSilenceElement:
    def _run(self, bufs, **props):
        propstr = " ".join(f"{k}={v}" for k, v in props.items())
        p = parse_launch(
            f"appsrc name=in ! audio/x-raw,format=S16LE,rate=8000,"
            f"channels=1 ! removesilence {propstr} ! appsink name=out")
        src = p.get_by_name("in")
        pts = 0
        for b in bufs:
            src.push_buffer(Buffer(
                data=b, pts=pts,
                duration=len(b) * 1_000_000_000 // 8000))
            pts += len(b) * 1_000_000_000 // 8000
        src.end_of_stream()
        p.run()
        outs = []
        sink = p.get_by_name("out")
        while (s := sink.pull_sample()) is not None:
            outs.append((s.buffer.pts,
                         np.asarray(s.buffer.data)))
        return outs

    @staticmethod
    def _voice(n):
        t = np.arange(n)
        return (np.sin(2 * np.pi * 30 * t / 8000) * 20000).astype(
            np.int16)[:, None]

    def test_remove_false_passthrough(self):
        outs = self._run([np.zeros((800, 1), np.int16)] * 3)
        assert len(outs) == 3

    def test_remove_drops_silence(self):
        bufs = ([self._voice(800)] * 3
                + [np.zeros((800, 1), np.int16)] * 5
                + [self._voice(800)] * 2)
        outs = self._run(bufs, remove="true")
        # silent middle dropped (minus the hysteresis transition buffer)
        assert 4 <= len(outs) <= 7
        total = sum(len(d) for _, d in outs)
        assert total < len(bufs) * 800

    def test_squash_compacts_timeline(self):
        bufs = ([self._voice(800)] * 2
                + [np.zeros((800, 1), np.int16)] * 4
                + [self._voice(800)] * 2)
        outs = self._run(bufs, remove="true", squash="true")
        # pts sequence has no large jump: max delta == buffer duration
        ptss = [p for p, _ in outs]
        deltas = [b - a for a, b in zip(ptss, ptss[1:])]
        assert max(deltas) == 100_000_000
