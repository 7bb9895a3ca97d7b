"""Media Source Extensions (gst-libs/gst/mse analog) tests."""

import numpy as np
import pytest

from gstreamer_tpu.core.element import element_factory_make
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.mse import MediaSource, SourceBuffer


@pytest.fixture(scope="module")
def webm_bytes(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mse") / "clip.mkv")
    p = parse_launch(
        "videotestsrc num-buffers=5 ! video/x-raw,format=I420,"
        "width=64,height=48,framerate=25/1 ! x264enc ! "
        f"matroskamux location={path}")
    p.run()
    p.set_state("null")
    return open(path, "rb").read()


def test_state_machine(webm_bytes):
    ms = MediaSource()
    assert ms.ready_state == "closed"
    with pytest.raises(RuntimeError):
        ms.add_source_buffer("video/webm")
    src = element_factory_make("msesrc")
    ms.attach(src)
    assert ms.ready_state == "open"
    sb = ms.add_source_buffer("video/webm")
    assert sb in ms.source_buffers
    assert ms.active_source_buffers == []
    sb.append_buffer(webm_bytes)
    assert ms.active_source_buffers == [sb]
    assert sb.buffered and sb.buffered[0][1] > 0.1
    ms.end_of_stream()
    assert ms.ready_state == "ended"
    assert ms.duration > 0.1
    ms.detach()
    assert ms.ready_state == "closed"


def test_msesrc_playback(webm_bytes):
    ms = MediaSource()
    src = element_factory_make("msesrc")
    ms.attach(src)
    sb = ms.add_source_buffer("video/webm")
    sb.append_buffer(webm_bytes)
    ms.end_of_stream()
    src.start()
    frames = 0
    while True:
        b = src.create(1)
        if b is None:
            break
        d = b.data
        y = np.asarray(d[0] if isinstance(d, (tuple, list)) else d)
        frames += y.shape[0] if y.ndim == 3 else 1
    src.stop()
    assert frames == 5
