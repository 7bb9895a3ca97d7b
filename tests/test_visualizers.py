"""Audio visualizer elements (wavescope/spectrascope/spacescope/
synaescope) + reference-exact spectrum/level analyzers.

Scalar semantics follow gstaudiovisualizer.c / gstwavescope.c /
gstspectrascope.c / gstspectrum.c / gstlevel.c; these tests pin the
element behavior (dot placement, shader fade, interval cadence, dB
math on known signals)."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch


def run_collect(desc):
    p = parse_launch(desc)
    p.run()
    sink = p.get_by_name("out")
    frames = []
    while True:
        s = sink.pull_sample()
        if s is None:
            break
        d = [np.asarray(x) for x in s.buffer.data]
        for k in range(d[0].shape[0]):
            frames.append(tuple(x[k] for x in d))
    return p, frames


class TestWaveScope:
    def test_dots_silence_draws_midline(self):
        # silence -> every dot lands on y = h/2, white
        from gstreamer_tpu.elements.visualizers import WaveScope
        el = WaveScope()
        el._w, el._h, el._channels = 16, 8, 1
        el._frame32 = np.zeros(16 * 8 + 16 + 2, np.uint32)
        el.render(el._frame32, np.zeros((16, 1), np.int16))
        img = el._frame32[:16 * 8].reshape(8, 16)
        assert (img[4] == 0x00FFFFFF).all()
        assert (img[:4] == 0).all() and (img[5:] == 0).all()

    def test_dots_amplitude_maps_rows(self):
        from gstreamer_tpu.elements.visualizers import WaveScope
        el = WaveScope()
        el._w, el._h, el._channels = 4, 64, 1
        el._frame32 = np.zeros(4 * 64 + 4 + 2, np.uint32)
        # sample value v -> y = h/2 + v*h/65536 (render_dots
        # gstwavescope.c:243)
        samples = np.array([[-32768], [0], [16384], [32767]], np.int16)
        el.render(el._frame32, samples)
        img = el._frame32[:4 * 64].reshape(64, 4)
        ys = {x: np.nonzero(img[:, x])[0][0] for x in range(4)}
        assert ys[0] == 0        # 32 + (-32768)*64/65536 = 0
        assert ys[1] == 32
        assert ys[2] == 48
        assert ys[3] == 63

    def test_pipeline_styles(self):
        for style in ("dots", "lines", "color-dots", "color-lines"):
            _, frames = run_collect(
                "audiotestsrc num-buffers=3 samplesperbuffer=2048 ! "
                f"wavescope style={style} ! "
                "video/x-raw,width=32,height=24,framerate=30/1 ! "
                "appsink name=out")
            assert frames, style
            assert any(f[0].any() or f[1].any() or f[2].any()
                       for f in frames), style


class TestShaders:
    def _run(self, shader):
        from gstreamer_tpu.elements.visualizers import apply_shader
        frame = np.zeros((6, 8 * 4), np.uint8)
        frame[3, 4 * 4:4 * 4 + 4] = (200, 150, 100, 0)   # one lit pixel
        temp = np.zeros_like(frame)
        apply_shader(shader, frame, temp, 0x000A0A0A)
        return frame, temp

    def test_fade_subtracts(self):
        _, temp = self._run("fade")
        assert tuple(temp[3, 16:20]) == (190, 140, 90, 0)

    def test_move_up(self):
        _, temp = self._run("fade-and-move-up")
        assert tuple(temp[2, 16:20]) == (190, 140, 90, 0)
        assert not temp[3].any()

    def test_move_right(self):
        _, temp = self._run("fade-and-move-right")
        assert tuple(temp[3, 20:24]) == (190, 140, 90, 0)

    def test_vert_out_moves_one_byte(self):
        # the reference shifts by ONE BYTE (s1 = s + 1 on guint8*,
        # gstaudiovisualizer.c:404) — byte-exact reproduction
        _, temp = self._run("fade-and-move-vert-out")
        # pixel 4 is in the right half (i >= w/2 = 4): d = d+1 byte, so
        # the shaded bytes land shifted right by one byte
        assert tuple(temp[3, 17:21]) == (190, 140, 90, 0)

    def test_fade_reaches_black(self):
        from gstreamer_tpu.elements.visualizers import apply_shader
        frame = np.full((4, 4 * 4), 255, np.uint8)
        temp = np.zeros_like(frame)
        for _ in range(26):
            apply_shader("fade", frame, temp, 0x000A0A0A)
            frame[:] = temp
        assert not frame.any()


class TestSpectraScope:
    def test_sine_peak_bar(self):
        # req_spf = 2*w; bin k center freq = k*rate/(2*w).
        _, frames = run_collect(
            "audiotestsrc num-buffers=4 samplesperbuffer=4096 wave=sine "
            "freq=5512 ! spectrascope shader=none ! "
            "video/x-raw,width=32,height=32,framerate=30/1 ! "
            "appsink name=out")
        assert frames
        r, g, b = frames[-1]
        # 5512.5 Hz at rate 44100, nfft=64 -> bin 8 -> bar at x = 7
        # (Hamming leakage saturates the neighbors too)
        col_height = (r > 0).sum(axis=0)
        assert col_height[7] == col_height.max()
        assert col_height[16] < col_height[7]


class TestSpaceScopeSynae:
    def test_spacescope_runs(self):
        for style in ("dots", "lines", "color-dots", "color-lines"):
            _, frames = run_collect(
                "audiotestsrc num-buffers=2 samplesperbuffer=2048 ! "
                "audioconvert ! audio/x-raw,channels=2 ! "
                f"spacescope style={style} ! "
                "video/x-raw,width=32,height=32,framerate=30/1 ! "
                "appsink name=out")
            assert frames and any(f[0].any() for f in frames), style

    def test_synaescope_runs(self):
        _, frames = run_collect(
            "audiotestsrc num-buffers=2 samplesperbuffer=4096 ! "
            "audioconvert ! audio/x-raw,channels=2 ! synaescope ! "
            "video/x-raw,width=64,height=64,framerate=30/1 ! "
            "appsink name=out")
        assert frames
        assert any(f[0].any() or f[1].any() or f[2].any() for f in frames)


class TestSpectrum:
    def test_sine_band_and_interval(self):
        # rate 44100, bands 128 -> nfft 254; interval 100ms
        p = parse_launch(
            "audiotestsrc num-buffers=10 samplesperbuffer=4410 wave=sine "
            "freq=4000 volume=1.0 ! spectrum ! fakesink")
        msgs = []
        p.bus.add_watch(lambda m: msgs.append(m)
                        if m.type == "element" else None)
        p.run()
        sp = [m for m in msgs if m.data.get("name") == "spectrum"]
        assert len(sp) >= 9          # one per 100ms of 1s total
        mag = np.array(sp[-1].data["magnitude"])
        assert mag.shape == (128,)
        # 4000 Hz -> band = 4000/(44100/2) * 127 ~= 23
        band = int(round(4000 / (44100 / 254)))
        assert abs(int(mag.argmax()) - band) <= 1
        # clamped at threshold
        assert mag.min() >= -60

    def test_multi_channel_and_phase(self):
        p = parse_launch(
            "audiotestsrc num-buffers=5 samplesperbuffer=4410 ! "
            "audioconvert ! audio/x-raw,channels=2 ! "
            "spectrum multi-channel=true message-phase=true ! fakesink")
        msgs = []
        p.bus.add_watch(lambda m: msgs.append(m)
                        if m.type == "element" else None)
        p.run()
        sp = [m for m in msgs if m.data.get("name") == "spectrum"]
        assert sp
        assert len(sp[-1].data["magnitude"]) == 2       # per channel
        assert len(sp[-1].data["phase"]) == 2


class TestLevel:
    def test_full_scale_sine_db(self):
        p = parse_launch(
            "audiotestsrc num-buffers=10 samplesperbuffer=4410 wave=sine "
            "volume=1.0 ! level ! fakesink")
        msgs = []
        p.bus.add_watch(lambda m: msgs.append(m)
                        if m.type == "element" else None)
        p.run()
        lv = [m for m in msgs if m.data.get("name") == "level"]
        assert len(lv) >= 9
        # full-scale sine: RMS = 1/sqrt(2) -> -3.01 dB; peak ~ 0 dB
        rms = lv[-1].data["rms"][0]
        peak = lv[-1].data["peak"][0]
        assert abs(rms + 3.01) < 0.2
        assert abs(peak) < 0.1
        assert lv[-1].data["decay"][0] >= peak - 1e-9

    def test_decay_falls_after_silence(self):
        p = parse_launch(
            "audiotestsrc num-buffers=40 samplesperbuffer=1102 "
            "wave=silence ! level peak-ttl=0 peak-falloff=100.0 ! fakesink")
        msgs = []
        p.bus.add_watch(lambda m: msgs.append(m)
                        if m.type == "element" else None)
        p.run()
        lv = [m for m in msgs if m.data.get("name") == "level"]
        assert lv
        # silence: rms at the epsilon floor
        assert lv[-1].data["rms"][0] < -300
