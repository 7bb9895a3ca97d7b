"""faceoverlay (gst-plugins-bad/gst/faceoverlay): image overlay placed
per detected face, face-relative x/y/w/h fractions."""

import numpy as np
import pytest

from gstreamer_tpu.codecs.png import png_encode
from tests.test_opencv_camera import (SYNTH_CASCADE, cascade_file,  # noqa
                                      run_frames)


@pytest.fixture
def overlay_png(tmp_path):
    # solid green RGBA square
    img = np.zeros((8, 8, 4), np.uint8)
    img[..., 1] = 255
    img[..., 3] = 255
    p = tmp_path / "overlay.png"
    p.write_bytes(png_encode(img, "RGBA"))
    return str(p)


def _blob_frames(x, y, size=12, w=96, h=64):
    img = np.full((h, w), 40, np.uint8)
    img[y:y + size, x:x + size] = 250
    return [(img, img.copy(), img.copy())]


class TestFaceOverlay:
    def test_overlay_lands_on_face(self, cascade_file, overlay_png):
        _, outs = run_frames(
            f"faceoverlay profile={cascade_file} min-neighbors=1 "
            f"location={overlay_png}",
            _blob_frames(40, 24), w=96, h=64)
        r, g, b = outs[0]
        green = (g > 180) & (r < 80)
        assert green.any()
        ys, xs = np.nonzero(green)
        # overlay covers the detected blob area (face at ~(40,24)+12)
        assert 30 <= xs.mean() <= 62 and 18 <= ys.mean() <= 44
        # and not the far corner
        assert not green[:6, 80:].any()

    def test_relative_size(self, cascade_file, overlay_png):
        _, big = run_frames(
            f"faceoverlay profile={cascade_file} min-neighbors=1 "
            f"location={overlay_png} w=2.0 h=2.0",
            _blob_frames(40, 24), w=96, h=64)
        _, small = run_frames(
            f"faceoverlay profile={cascade_file} min-neighbors=1 "
            f"location={overlay_png} w=0.5 h=0.5",
            _blob_frames(40, 24), w=96, h=64)
        nbig = ((big[0][1] > 180) & (big[0][0] < 80)).sum()
        nsmall = ((small[0][1] > 180) & (small[0][0] < 80)).sum()
        assert nbig > nsmall > 0

    def test_no_cascade_passthrough(self, overlay_png):
        _, outs = run_frames(
            f"faceoverlay location={overlay_png}",
            _blob_frames(40, 24), w=96, h=64)
        assert not ((outs[0][1] > 180) & (outs[0][0] < 80)).any()
