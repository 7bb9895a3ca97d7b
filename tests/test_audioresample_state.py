"""audioresample streaming state: FIR phase carried across chunks
(perfect-stream), timestamp drift tracking, and mid-stream rate change
via renegotiation (gstaudioresample.c:1146, audio-resampler.c:1750).
"""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.caps import Caps
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.core.pipeline import State
from gstreamer_tpu.elements.audio_elements import AudioResample


def make_resample(in_rate, out_rate):
    e = AudioResample()
    ic = Caps.from_string(f"audio/x-raw,format=S16LE,rate={in_rate},"
                          "channels=2,layout=interleaved")
    oc = Caps.from_string(f"audio/x-raw,format=S16LE,rate={out_rate},"
                          "channels=2,layout=interleaved")
    e.set_info(ic, oc)
    e.start()
    return e


def run_chunks(e, x, chunk, in_rate):
    outs = []
    pts = 0
    for i in range(0, len(x), chunk):
        part = x[i:i + chunk]
        b = e.host_process(Buffer(data=part, pts=pts,
                                  batch=1))
        pts += len(part) * 1_000_000_000 // in_rate
        if b is not None:
            outs.append(np.asarray(b.data))
    return np.concatenate(outs, axis=0) if outs else np.zeros((0, 2))


@pytest.mark.parametrize("rates", [(48000, 16000), (44100, 48000),
                                   (48000, 44100), (8000, 44100)])
def test_perfect_stream_across_chunks(rates):
    """Chunked output must be a PREFIX-exact match of one-shot output —
    the phase survives chunk boundaries (reference test_perfect_stream,
    audioresample.c:220)."""
    in_rate, out_rate = rates
    rng = np.random.default_rng(0)
    n = 4096
    x = rng.integers(-32768, 32767, (n, 2), np.int16)

    one = np.asarray(make_resample(in_rate, out_rate).host_process(
        Buffer(data=x, pts=0, batch=1)).data)

    for chunk in (512, 700, 1024):
        e = make_resample(in_rate, out_rate)
        got = run_chunks(e, x, chunk, in_rate)
        m = min(len(one), len(got))
        assert m > 0
        np.testing.assert_array_equal(got[:m], one[:m],
                                      err_msg=f"chunk={chunk}")


def test_output_count_perfect():
    """Cumulative output count tracks in*out_rate/in_rate exactly (no
    drift in sample count over many chunks)."""
    e = make_resample(44100, 48000)
    rng = np.random.default_rng(1)
    total_in, total_out = 0, 0
    for _ in range(50):
        x = rng.integers(-32768, 32767, (441, 2), np.int16)
        b = e.host_process(Buffer(data=x, pts=None, batch=1))
        total_in += 441
        if b is not None:
            total_out += np.asarray(b.data).shape[0]
    expect = total_in * 48000 // 44100
    # the tap window + worst-phase reserve hold back a bounded tail
    assert expect - total_out <= e._res.n_taps * 48000 // 44100 + 2
    assert total_out <= expect


def test_timestamps_follow_output_rate():
    e = make_resample(48000, 16000)
    rng = np.random.default_rng(2)
    pts_seen = []
    pts = 0
    for _ in range(6):
        x = rng.integers(-32768, 32767, (4800, 2), np.int16)
        b = e.host_process(Buffer(data=x, pts=pts, batch=1))
        pts += 4800 * 1_000_000_000 // 48000
        if b is not None:
            pts_seen.append((b.pts, np.asarray(b.data).shape[0]))
    # consecutive output pts advance by out_count/out_rate exactly
    acc = pts_seen[0][0]
    count = 0
    for p, n in pts_seen:
        assert p == pts_seen[0][0] + count * 1_000_000_000 // 16000
        count += n


def test_drift_resync():
    e = make_resample(48000, 16000)
    rng = np.random.default_rng(3)
    x = rng.integers(-32768, 32767, (4800, 2), np.int16)
    b1 = e.host_process(Buffer(data=x, pts=0, batch=1))
    assert b1.pts == 0
    # a 1-second input gap (discont beyond tolerance) re-anchors output
    b2 = e.host_process(Buffer(data=x, pts=1_100_000_000, batch=1))
    hist = 4800 - (np.asarray(b1.data).shape[0] * 48000 // 16000)
    expect_base = 1_100_000_000 - hist * 1_000_000_000 // 48000
    assert abs(b2.pts - expect_base) <= 1_000_000_000 // 48000 + 1


def test_rate_change_midstream_renegotiates():
    p = parse_launch(
        "appsrc name=in caps=audio/x-raw,format=S16LE,rate=48000,"
        "channels=2,layout=interleaved ! audioresample ! "
        "audio/x-raw,rate=16000 ! appsink name=s")
    src, sink = p.get_by_name("in"), p.get_by_name("s")
    rng = np.random.default_rng(4)
    src.push_buffer(Buffer(
        data=rng.integers(-32768, 32767, (4800, 2), np.int16),
        pts=0, batch=1))
    src.set_caps("audio/x-raw,format=S16LE,rate=32000,channels=2,"
                 "layout=interleaved")
    src.push_buffer(Buffer(
        data=rng.integers(-32768, 32767, (3200, 2), np.int16),
        pts=100_000_000, batch=1))
    p.set_state(State.PLAYING)
    assert p.tick()
    c0 = p.compile_count
    assert p.tick()          # renegotiated 32000 -> 16000
    assert p.compile_count == c0 + 1
    outs = []
    while len(sink):
        outs.append(np.asarray(sink.pull_sample().buffer.data))
    assert len(outs) == 2
    assert all(o.shape[1] == 2 for o in outs)
