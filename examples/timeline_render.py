"""Editing-services timeline rendered to a Matroska file."""

import os
import tempfile

from gstreamer_tpu.core.element import element_factory_make
from gstreamer_tpu.core.pipeline import Pipeline, link
from gstreamer_tpu.core.value import Fraction
from gstreamer_tpu.editing import Effect, TestClip, Timeline, VideoTrack

NS = 1_000_000_000


def main():
    tl = Timeline(video=VideoTrack(width=320, height=180,
                                   fps=Fraction(25, 1)))
    layer = tl.append_layer()
    layer.add_clip(TestClip(start=0, duration=2 * NS, pattern="smpte75"))
    clip = layer.add_clip(TestClip(start=3 * NS // 2, duration=2 * NS,
                                   pattern="ball"))
    clip.add_effect(Effect("videobalance saturation=0.3"))

    out = os.path.join(tempfile.gettempdir(), "timeline.mkv")
    src = element_factory_make("timelinevideosrc", timeline=tl)
    mux = element_factory_make("matroskamux", location=out)
    sink = element_factory_make("fakesink")
    p = Pipeline()
    p.add(src, mux, sink)
    link(src, mux, sinkpad="video_0")
    link(mux, sink)
    p.run()
    print(f"rendered {tl.duration / NS:.1f}s timeline "
          f"(crossfade at 1.5-2.0s) to {out} "
          f"({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
