"""Editing services (GES equivalent): timeline/layers/clips/tracks,
auto-transitions, effects, rendering through normal pipelines."""

import numpy as np
import pytest

from gstreamer_tpu.core.element import element_factory_make
from gstreamer_tpu.core.pipeline import Pipeline, link
from gstreamer_tpu.core.value import Fraction
from gstreamer_tpu.editing import (AudioTrack, Effect, TestClip, Timeline,
                                   VideoTrack)

NS = 1_000_000_000


def small_tracks():
    return (VideoTrack(width=32, height=24, fps=Fraction(10, 1)),
            AudioTrack(rate=8000, channels=1))


def render_video(tl, batch=4):
    src = element_factory_make("timelinevideosrc", timeline=tl)
    sink = element_factory_make("appsink", name="out")
    p = Pipeline()
    p.add(src, sink)
    link(src, sink)
    p.run()
    frames = []
    while True:
        s = sink.pull_sample()
        if s is None:
            break
        d = [np.asarray(x) for x in s.buffer.data]
        for k in range(d[0].shape[0]):
            frames.append(tuple(x[k] for x in d))
    return frames


def render_audio(tl):
    src = element_factory_make("timelineaudiosrc", timeline=tl)
    sink = element_factory_make("appsink", name="out")
    p = Pipeline()
    p.add(src, sink)
    link(src, sink)
    p.run()
    chunks = []
    while True:
        s = sink.pull_sample()
        if s is None:
            break
        chunks.append(np.asarray(s.buffer.data))
    return np.concatenate(chunks, axis=0) if chunks else np.zeros((0, 1))


class TestTimelineModel:
    def test_stack_and_priority(self):
        v, a = small_tracks()
        tl = Timeline(video=v, audio=a)
        l0 = tl.append_layer()
        l1 = tl.append_layer()
        top = l0.add_clip(TestClip(start=0, duration=NS, pattern="white"))
        bot = l1.add_clip(TestClip(start=0, duration=2 * NS,
                                   pattern="black"))
        stack = tl.stack_at(NS // 2)
        assert stack[0][1] is top and stack[1][1] is bot
        assert tl.stack_at(NS + 1)[0][1] is bot
        assert tl.duration == 2 * NS

    def test_auto_transition_detection(self):
        v, a = small_tracks()
        tl = Timeline(video=v, audio=a)
        layer = tl.append_layer()
        c1 = layer.add_clip(TestClip(start=0, duration=NS))
        c2 = layer.add_clip(TestClip(start=NS // 2, duration=NS))
        trans = tl.transition_at(3 * NS // 4)
        assert trans is not None
        a_, b_, prog = trans
        assert a_ is c1 and b_ is c2
        assert abs(prog - 0.5) < 1e-6
        assert tl.transition_at(NS // 4) is None
        tl.auto_transition = False
        assert tl.transition_at(3 * NS // 4) is None


class TestVideoRender:
    def test_solid_clips_and_gap(self):
        v, a = small_tracks()
        tl = Timeline(video=v, audio=a)
        layer = tl.append_layer()
        layer.add_clip(TestClip(start=0, duration=NS // 2,
                                pattern="white"))
        # gap from 0.5s to 1.0s, then black clip
        layer.add_clip(TestClip(start=NS, duration=NS // 2,
                                pattern="black"))
        frames = render_video(tl)
        assert len(frames) == 15            # 1.5s at 10 fps
        # white: Y=235 (video range); gap: Y=0; black: Y=16
        assert frames[0][0].mean() > 200
        assert frames[7][0].max() == 0      # the gap renders black
        assert abs(int(frames[12][0][0, 0]) - 16) <= 1

    def test_crossfade_midpoint(self):
        v, a = small_tracks()
        tl = Timeline(video=v, audio=a)
        layer = tl.append_layer()
        layer.add_clip(TestClip(start=0, duration=NS, pattern="white"))
        layer.add_clip(TestClip(start=NS // 2, duration=NS,
                                pattern="black"))
        frames = render_video(tl)
        assert len(frames) == 15
        # frame at t=0.7s: prog=0.4 -> Y = white*(0.6)+black*0.4
        y = int(frames[7][0][0, 0])
        expect = (235 * (256 - int(0.4 * 256))
                  + 16 * int(0.4 * 256)) >> 8
        assert abs(y - expect) <= 2
        # after the overlap, pure black clip
        assert abs(int(frames[12][0][0, 0]) - 16) <= 1

    def test_effect_applied(self):
        v, a = small_tracks()
        tl = Timeline(video=v, audio=a)
        layer = tl.append_layer()
        clip = layer.add_clip(TestClip(start=0, duration=NS // 2,
                                       pattern="smpte"))
        clip.add_effect(Effect("videobalance saturation=0.0"))
        frames = render_video(tl)
        # desaturated: chroma planes neutral
        u = frames[0][1].astype(int)
        vpl = frames[0][2].astype(int)
        assert np.abs(u - 128).max() <= 1
        assert np.abs(vpl - 128).max() <= 1

    def test_inpoint_skips_media(self):
        v, a = small_tracks()
        v2, _ = small_tracks()
        # snow advances per frame (LCG), so frame 0 with inpoint=0.5s
        # differs from inpoint=0
        tl1 = Timeline(video=v, audio=a)
        tl1.append_layer().add_clip(
            TestClip(start=0, duration=NS // 2, pattern="snow"))
        f_no_inpoint = render_video(tl1)[0]
        tl2 = Timeline(video=v2, audio=a)
        tl2.append_layer().add_clip(
            TestClip(start=0, duration=NS // 2, inpoint=NS // 2,
                     pattern="snow"))
        f_inpoint = render_video(tl2)[0]
        assert not np.array_equal(f_no_inpoint[0], f_inpoint[0])


class TestAudioRender:
    def test_sine_then_silence_gap(self):
        v, a = small_tracks()
        tl = Timeline(video=v, audio=a)
        layer = tl.append_layer()
        layer.add_clip(TestClip(start=0, duration=NS // 2, wave="sine",
                                volume=1.0))
        layer.add_clip(TestClip(start=NS, duration=NS // 2,
                                wave="silence"))
        audio = render_audio(tl)
        assert audio.shape[0] == 8000 * 3 // 2
        first = audio[:4000].astype(np.float64) / 32768
        gap = audio[4100:7900]
        assert np.sqrt((first ** 2).mean()) > 0.5     # sine playing
        assert np.abs(gap).max() == 0                 # gap silent

    def test_audio_crossfade_ramps(self):
        v, a = small_tracks()
        tl = Timeline(video=v, audio=a)
        layer = tl.append_layer()
        layer.add_clip(TestClip(start=0, duration=NS, wave="sine",
                                volume=1.0))
        layer.add_clip(TestClip(start=NS // 2, duration=NS,
                                wave="silence"))
        audio = render_audio(tl).astype(np.float64) / 32768
        # RMS over the overlap decays towards zero
        seg = lambda t0, t1: audio[int(t0 * 8000):int(t1 * 8000)]
        rms = lambda x: float(np.sqrt((x ** 2).mean()))
        assert rms(seg(0.5, 0.6)) > rms(seg(0.8, 0.9)) > rms(seg(1.2, 1.3))


class TestKeyframedEffects:
    """GES control-binding path (ges_track_element_set_control_source):
    keyframed effect properties animate through the framework's
    dynamic-property inputs — one compile, no per-frame recompiles."""

    def test_keyframed_volume_fade(self):
        import numpy as np
        from gstreamer_tpu.core.parse import parse_launch
        from gstreamer_tpu.editing import (AudioTrack, Effect,
                                           TestClip, Timeline)

        tl = Timeline(audio=AudioTrack(rate=8000, channels=1))
        layer = tl.append_layer()
        clip = TestClip(start=0, duration=1_000_000_000, freq=440.0)
        fx = Effect("volume")
        fx.set_keyframe("volume", 0, 1.0)
        fx.set_keyframe("volume", 1_000_000_000, 0.0)   # fade out
        clip.add_effect(fx)
        layer.add_clip(clip)

        p = parse_launch("timelineaudiosrc name=src ! appsink name=o")
        p.get_by_name("src").set_property("timeline", tl)
        p.run()
        sink = p.get_by_name("o")
        chunks = []
        while (s := sink.pull_sample()) is not None:
            chunks.append(np.asarray(s.buffer.data))
        pcm = np.concatenate(chunks, axis=0).ravel()
        n = len(pcm)
        head = np.abs(pcm[: n // 8]).max()
        tail = np.abs(pcm[-n // 8:]).max()
        assert head > 3 * max(tail, 1e-9), (head, tail)


def test_title_clip_renders_text():
    """ges-title-clip.c analog: text over a solid background
    (64x48: the bitmap font needs room beyond textoverlay's default
    padding)."""
    from gstreamer_tpu.editing.timeline import TitleClip
    tracks = (VideoTrack(width=64, height=48, fps=Fraction(10, 1)),
              AudioTrack(rate=8000, channels=1))
    tl = Timeline(*tracks)
    layer = tl.append_layer()
    layer.add_clip(TitleClip(start=0, duration=NS, text="HI",
                             background="black", font_size=20))
    frames = render_video(tl)
    y = np.asarray(frames[0][0])
    assert (y > 128).sum() > 0           # glyph pixels on black
    # a blank title on black has no bright pixels
    tl2 = Timeline(VideoTrack(width=64, height=48,
                              fps=Fraction(10, 1)),
                   AudioTrack(rate=8000, channels=1))
    tl2.append_layer().add_clip(TitleClip(
        start=0, duration=NS, text="", background="black"))
    y2 = np.asarray(render_video(tl2)[0][0])
    assert (y2 > 128).sum() == 0


def test_uri_clip_mp4_route(tmp_path):
    """UriClip routes .mp4 through qtdemux."""
    from gstreamer_tpu.editing.timeline import UriClip
    clip = UriClip(start=0, duration=NS, location="/x/a.mp4")
    assert "qtdemux" in clip.video_launch(None)
    clip = UriClip(start=0, duration=NS, location="/x/a.webm")
    assert "matroskademux" in clip.video_launch(None)
    clip = UriClip(start=0, duration=NS, location="/x/a.ogv")
    assert "oggdemux" in clip.video_launch(None)


class TestGroups:
    """ges-group.c: cross-layer clip containers."""

    def test_group_shift_moves_members(self):
        v, a = small_tracks()
        tl = Timeline(video=v, audio=a)
        l0, l1 = tl.append_layer(), tl.append_layer()
        c1 = l0.add_clip(TestClip(start=0, duration=NS))
        c2 = l1.add_clip(TestClip(start=NS // 2, duration=NS))
        from gstreamer_tpu.editing import Group
        g = Group.group([c1, c2])
        assert g.start == 0 and g.end == NS * 3 // 2
        assert g.duration == NS * 3 // 2
        g.start = NS                  # move the whole group
        assert c1.start == NS and c2.start == NS * 3 // 2
        assert g.duration == NS * 3 // 2      # offsets preserved
        g.shift(-NS // 2)
        assert c1.start == NS // 2
        with pytest.raises(ValueError):
            g.shift(-NS)              # before t=0
        clips = g.ungroup()
        assert clips == [c1, c2] and not g.clips

    def test_group_move_changes_render(self):
        v, a = small_tracks()
        tl = Timeline(video=v, audio=a)
        layer = tl.append_layer()
        c = layer.add_clip(TestClip(start=0, duration=NS // 2,
                                    pattern="white"))
        from gstreamer_tpu.editing import Group
        Group.group([c]).start = NS // 2
        frames = render_video(tl)
        # first half is gap (black), second half is the white clip
        assert len(frames) == 10
        assert frames[0][0].mean() < 32          # black gap
        assert frames[-1][0].mean() > 200        # white clip


class TestNestedTimelines:
    """Nested timeline used as a clip (ges:// URI analog)."""

    def test_nested_video_renders_inside_outer(self):
        v, a = small_tracks()
        inner = Timeline(video=VideoTrack(width=16, height=16,
                                          fps=Fraction(10, 1)),
                         audio=None)
        il = inner.append_layer()
        il.add_clip(TestClip(start=0, duration=NS, pattern="white"))

        from gstreamer_tpu.editing import NestedTimelineClip
        outer = Timeline(video=v, audio=a)
        ol = outer.append_layer()
        ol.add_clip(NestedTimelineClip(start=NS // 2, duration=NS,
                                       timeline=inner))
        frames = render_video(outer)
        assert len(frames) == 15                  # 1.5 s at 10 fps
        assert frames[0][0].mean() < 32           # gap before the clip
        # center of the last frame shows the nested white media (the
        # 16x16 source is aspect-fit into 32x24 with borders)
        assert frames[-1][0][12, 16] > 200
        assert frames[-1][0].shape == (24, 32)

    def test_nested_inpoint_and_audio(self):
        inner = Timeline(video=None,
                         audio=AudioTrack(rate=8000, channels=1))
        il = inner.append_layer()
        il.add_clip(TestClip(start=0, duration=NS, wave="square",
                             freq=400.0, volume=1.0))

        from gstreamer_tpu.editing import NestedTimelineClip
        outer = Timeline(video=None,
                         audio=AudioTrack(rate=8000, channels=1))
        ol = outer.append_layer()
        ol.add_clip(NestedTimelineClip(start=0, duration=NS // 2,
                                       inpoint=NS // 4,
                                       timeline=inner))
        samples = render_audio(outer)
        assert samples.shape[0] == 4000           # 0.5 s at 8 kHz
        assert np.abs(samples.astype(np.int32)).max() > 10000  # audible
