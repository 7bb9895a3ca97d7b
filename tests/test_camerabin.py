"""camerabin (gstcamerabin2.c, reduced): image and video capture."""

import numpy as np
import pytest

from gstreamer_tpu.core.element import element_factory_make
from gstreamer_tpu.core.parse import parse_launch


def test_image_capture(tmp_path):
    cam = element_factory_make(
        "camerabin", mode=1, location=str(tmp_path / "shot_%d"))
    path = cam.start_capture()
    assert path.endswith("shot_0.jpg")
    from gstreamer_tpu.codecs.jpeg import jpeg_decode
    planes, w, h, _sub = jpeg_decode(open(path, "rb").read())
    assert (h, w) == (240, 320)
    # second capture increments the index
    path2 = cam.start_capture()
    assert path2.endswith("shot_1.jpg")
    assert cam.captures == [path, path2]


def test_video_capture(tmp_path):
    cam = element_factory_make(
        "camerabin", mode=2, location=str(tmp_path / "clip_%d"))
    assert cam.start_capture() is None       # recording starts
    path = cam.stop_capture()
    assert path.endswith("clip_0.mkv")
    p = parse_launch(f"matroskademux location={path} stream=video ! "
                     "appsink name=out")
    p.run()
    total = 0
    while (s := p.get_by_name("out").pull_sample()) is not None:
        d = s.buffer.data
        total += np.asarray(d[0] if isinstance(d, (tuple, list))
                            else d).shape[0]
    assert total == 10
