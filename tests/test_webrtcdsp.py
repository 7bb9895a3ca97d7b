"""webrtcdsp / webrtcechoprobe: noise suppression, AGC, VAD and NLMS
echo cancellation (reduced re-spec of the webrtc-audio-processing
wrap, gst-plugins-bad/ext/webrtcdsp/gstwebrtcdsp.cpp)."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch

RATE = 16000


def run_chain(launch, x, pts=0, rate=RATE, fmt="F32LE", n_push=1):
    p = parse_launch(
        f"appsrc name=in ! audio/x-raw, format={fmt}, rate={rate}, "
        f"channels=1, layout=interleaved ! {launch} ! appsink name=out")
    chunks = np.array_split(x, n_push)
    t = pts
    for c in chunks:
        p.get_by_name("in").push_buffer(Buffer(
            data=c.astype(np.float32), pts=t,
            duration=len(c) * 1_000_000_000 // rate))
        t += len(c) * 1_000_000_000 // rate
    p.get_by_name("in").end_of_stream()
    p.run()
    outs = []
    while (s := p.get_by_name("out").pull_sample()) is not None:
        outs.append(np.asarray(s.buffer.data))
    return p, np.concatenate([o.ravel() for o in outs])


def speech_like(n, rate=RATE, seed=0):
    """AM tone bursts approximating voiced segments."""
    t = np.arange(n) / rate
    carrier = 0.4 * np.sin(2 * np.pi * 220 * t) \
        + 0.2 * np.sin(2 * np.pi * 440 * t)
    envelope = (np.sin(2 * np.pi * 2.0 * t) > 0).astype(float)
    return (carrier * envelope).astype(np.float64), envelope


class TestNoiseSuppression:
    def test_snr_improves(self):
        n = RATE * 2
        rng = np.random.default_rng(0)
        speech, env = speech_like(n)
        noise = 0.03 * rng.standard_normal(n)
        noisy = speech + noise
        _, out = run_chain(
            "webrtcdsp echo-cancel=false gain-control=false "
            "noise-suppression-level=high", noisy)
        # compare noise power in silent regions, after convergence;
        # erode the region edges by 2 blocks (the NS path has one
        # 10 ms block of overlap-add latency)
        guard = RATE // 25
        silent = env == 0
        silent &= np.roll(silent, guard) & np.roll(silent, -guard)
        silent[:RATE // 2] = False
        before = float((noisy[silent] ** 2).mean())
        after = float((out[:n][silent] ** 2).mean())
        assert after < before * 0.25        # >= 6 dB cleaner
        # speech regions survive
        voiced = env == 1
        voiced &= np.roll(voiced, guard) & np.roll(voiced, -guard)
        voiced[:RATE // 2] = False
        assert float((out[:n][voiced] ** 2).mean()) \
            > 0.3 * float((noisy[voiced] ** 2).mean())


class TestAgc:
    def test_quiet_signal_amplified(self):
        n = RATE
        t = np.arange(n) / RATE
        quiet = 0.02 * np.sin(2 * np.pi * 300 * t)
        _, out = run_chain(
            "webrtcdsp echo-cancel=false noise-suppression=false "
            "high-pass-filter=false compression-gain-db=30", quiet)
        tail_in = quiet[-RATE // 4:]
        tail_out = out[:n][-RATE // 4:]
        assert float(np.abs(tail_out).max()) \
            > 3.0 * float(np.abs(tail_in).max())

    def test_limiter_bounds_output(self):
        n = RATE
        loud = 0.95 * np.sin(2 * np.pi * 300 * np.arange(n) / RATE)
        _, out = run_chain(
            "webrtcdsp echo-cancel=false noise-suppression=false "
            "high-pass-filter=false", loud)
        assert float(np.abs(out).max()) <= 1.0


class TestVad:
    def test_voice_activity_messages(self):
        n = RATE * 2
        speech, env = speech_like(n)
        p, _ = run_chain(
            "webrtcdsp echo-cancel=false noise-suppression=false "
            "gain-control=false voice-detection=true", speech)
        msgs = [m for m in iter(lambda: p.bus.pop(), None)
                if m.type == "element"
                and m.data.get("name") == "voice-activity"]
        assert msgs
        vals = [m.data["stream-has-voice"] for m in msgs]
        assert any(vals) and not all(vals)
        assert all("timestamp" in m.data for m in msgs)


class TestEchoCancel:
    def test_erle_after_convergence(self):
        n = RATE * 4
        rng = np.random.default_rng(1)
        far = 0.5 * rng.standard_normal(n)
        delay = 80                         # 5 ms echo path
        echo = 0.6 * np.concatenate([np.zeros(delay), far[:-delay]])
        near = echo                        # pure echo, no local talk

        p = parse_launch(
            "appsrc name=far ! audio/x-raw, format=F32LE, "
            f"rate={RATE}, channels=1, layout=interleaved ! "
            "webrtcechoprobe name=probe ! fakesink "
            "appsrc name=near ! audio/x-raw, format=F32LE, "
            f"rate={RATE}, channels=1, layout=interleaved ! "
            "webrtcdsp probe=probe noise-suppression=false "
            "gain-control=false high-pass-filter=false ! "
            "appsink name=out")
        # feed in alternating small chunks so the probe history is
        # populated when the dsp processes each block
        chunk = RATE // 10
        t = 0
        for b in range(0, n, chunk):
            p.get_by_name("far").push_buffer(Buffer(
                data=far[b:b + chunk].astype(np.float32), pts=t))
            p.get_by_name("near").push_buffer(Buffer(
                data=near[b:b + chunk].astype(np.float32), pts=t))
            t += chunk * 1_000_000_000 // RATE
        p.get_by_name("far").end_of_stream()
        p.get_by_name("near").end_of_stream()
        p.run()
        outs = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            outs.append(np.asarray(s.buffer.data).ravel())
        out = np.concatenate(outs)
        last = slice(3 * RATE, 4 * RATE)
        e_in = float((near[last] ** 2).mean())
        e_out = float((out[last] ** 2).mean())
        erle_db = 10 * np.log10(e_in / max(e_out, 1e-12))
        assert erle_db > 10.0, f"ERLE {erle_db:.1f} dB"


class TestFormats:
    def test_s16_roundtrip(self):
        n = RATE // 2
        x = (0.2 * np.sin(2 * np.pi * 400 * np.arange(n) / RATE)
             * 32767).astype(np.int16)
        p = parse_launch(
            f"appsrc name=in ! audio/x-raw, format=S16LE, rate={RATE},"
            f" channels=1, layout=interleaved ! webrtcdsp "
            f"echo-cancel=false ! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(data=x, pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        out = np.asarray(s.buffer.data)
        assert out.dtype == np.int16
        assert out.shape[0] == n
