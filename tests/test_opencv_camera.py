"""OpenCV-analog camera + cascade elements: dewarp, cameraundistort,
cameracalibrate (cv2 calib3d oracle), facedetect/faceblur/handdetect
(synthetic Haar cascade)."""

import math

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.opencv_camera import (
    _optimal_new_camera_matrix, _undistort_maps, calibrate_camera,
    deserialize_undistort_settings, find_chessboard_corners,
    serialize_undistort_settings)
from gstreamer_tpu.ops.haar import HaarCascade, group_rectangles

cv2 = pytest.importorskip("cv2")

K = np.array([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]])
DIST = np.array([-0.25, 0.08, 0.0, 0.0, 0.0])
W, H = 320, 240


SYNTH_CASCADE = """<?xml version="1.0"?>
<opencv_storage>
<cascade type_id="opencv-cascade-classifier">
  <stageType>BOOST</stageType>
  <featureType>HAAR</featureType>
  <height>8</height>
  <width>8</width>
  <stageParams><maxWeakCount>2</maxWeakCount></stageParams>
  <featureParams><maxCatCount>0</maxCatCount></featureParams>
  <stageNum>1</stageNum>
  <stages>
    <_>
      <maxWeakCount>2</maxWeakCount>
      <stageThreshold>1.5</stageThreshold>
      <weakClassifiers>
        <_>
          <internalNodes>0 -1 0 2.0000000000000000e-01</internalNodes>
          <leafValues>0. 1.</leafValues>
        </_>
        <_>
          <internalNodes>0 -1 1 2.0000000000000000e-01</internalNodes>
          <leafValues>0. 1.</leafValues>
        </_>
      </weakClassifiers>
    </_>
  </stages>
  <features>
    <_>
      <rects>
        <_>0 0 8 8 -1.</_>
        <_>2 2 4 4 4.</_>
      </rects>
      <tilted>0</tilted>
    </_>
    <_>
      <rects>
        <_>0 2 8 4 -1.</_>
        <_>2 2 4 4 2.</_>
      </rects>
      <tilted>0</tilted>
    </_>
  </features>
</cascade>
</opencv_storage>
"""


@pytest.fixture
def cascade_file(tmp_path):
    p = tmp_path / "synth.xml"
    p.write_text(SYNTH_CASCADE)
    return str(p)


def run_frames(launch, frames, fmt="RGB", w=64, h=48):
    p = parse_launch(
        f"appsrc name=in ! video/x-raw, format={fmt}, width={w}, "
        f"height={h}, framerate=30/1 ! {launch} ! appsink name=out")
    for i, planes in enumerate(frames):
        p.get_by_name("in").push_buffer(Buffer(
            data=tuple(pl[None] for pl in planes), batch=1,
            pts=i * 33333333, duration=33333333))
    p.get_by_name("in").end_of_stream()
    p.run()
    outs = []
    sink = p.get_by_name("out")
    while True:
        s = sink.pull_sample()
        if s is None:
            break
        outs.append([np.asarray(x)[0] for x in s.buffer.data])
    return p, outs


class TestSettingsWire:
    def test_roundtrip(self):
        s = serialize_undistort_settings(K, DIST)
        k2, d2 = deserialize_undistort_settings(s)
        np.testing.assert_allclose(k2, K)
        np.testing.assert_allclose(d2, DIST)

    def test_cv2_filestorage_compatible(self):
        """cv2's FileStorage must read our XML (same wire format as
        camerautils.cpp's serializer)."""
        s = serialize_undistort_settings(K, DIST)
        fs = cv2.FileStorage(s, cv2.FILE_STORAGE_READ
                             | cv2.FILE_STORAGE_MEMORY)
        cm = fs.getNode("cameraMatrix").mat()
        dc = fs.getNode("distCoeffs").mat()
        np.testing.assert_allclose(cm, K)
        np.testing.assert_allclose(dc.ravel(), DIST)


class TestUndistortMath:
    def test_rectify_maps_match_cv2(self):
        new_k, _ = cv2.getOptimalNewCameraMatrix(K, DIST, (W, H), 0.0)
        m1, m2 = cv2.initUndistortRectifyMap(K, DIST, None, new_k,
                                             (W, H), cv2.CV_32FC1)
        mx, my = _undistort_maps(K, DIST, W, H, new_k)
        assert np.abs(mx - m1).max() < 1e-3
        assert np.abs(my - m2).max() < 1e-3

    def test_optimal_matrix_close_to_cv2(self):
        for alpha in (0.0, 0.5, 1.0):
            ref, _ = cv2.getOptimalNewCameraMatrix(K, DIST, (W, H),
                                                   alpha)
            mine, _ = _optimal_new_camera_matrix(K, DIST, W, H, alpha)
            assert np.abs(mine - ref).max() < 0.5

    def test_element_matches_cv2_undistort(self):
        from gstreamer_tpu.core.element import element_factory_make

        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (H, W, 3), np.uint8)
        settings = serialize_undistort_settings(K, DIST)
        p = parse_launch(
            f"appsrc name=in ! video/x-raw, format=RGB, width={W}, "
            f"height={H}, framerate=30/1 ! cameraundistort name=u ! "
            f"appsink name=out")
        u = p.get_by_name("u")
        u.props["settings"] = settings
        u._kd = deserialize_undistort_settings(settings)
        p.get_by_name("in").push_buffer(Buffer(
            data=tuple(img[..., c][None] for c in range(3)), batch=1))
        p.get_by_name("in").end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        got = np.stack([np.asarray(x)[0] for x in s.buffer.data], -1)
        new_k, _ = cv2.getOptimalNewCameraMatrix(K, DIST, (W, H), 0.0)
        ref = cv2.undistort(img, K, DIST, None, new_k)
        d = np.abs(got.astype(int) - ref.astype(int))
        # float bilinear vs cv2's fixed-point remap (1/32-px
        # quantized sample coords): on a pure-noise image 95%+ of
        # pixels within 2 levels, tail bounded
        assert (d <= 2).mean() > 0.95
        assert (d <= 16).mean() > 0.999


class TestCalibrate:
    def _views(self, n=6):
        rng = np.random.default_rng(2)
        bw, bh, sq = 9, 6, 30.0
        obj = np.array([[j * sq, i * sq, 0.0]
                        for i in range(bh) for j in range(bw)])
        vi = []
        for v in range(n):
            rvec = rng.normal(0, 0.15, 3)
            tvec = np.array([-120 + rng.normal(0, 10),
                             -80 + rng.normal(0, 10), 400 + v * 30.0])
            imgp, _ = cv2.projectPoints(obj, rvec, tvec, K, DIST)
            vi.append(imgp.reshape(-1, 2))
        return [obj] * n, vi

    def test_zhang_recovers_intrinsics(self):
        vo, vi = self._views()
        K_m, d_m, rms = calibrate_camera(vo, vi, W, H)
        assert abs(K_m[0, 0] - 300) / 300 < 0.05
        assert abs(K_m[1, 1] - 300) / 300 < 0.05
        assert abs(K_m[0, 2] - 160) < 12
        assert abs(K_m[1, 2] - 120) < 12
        assert rms < 0.5

    def test_corner_finder_matches_cv2(self):
        bw, bh = 9, 6
        img = np.full((H, W), 200, np.uint8)
        x0, y0, cell = 40, 30, 24
        for i in range(bh + 1):
            for j in range(bw + 1):
                if (i + j) % 2 == 0:
                    img[y0 + i * cell:y0 + (i + 1) * cell,
                        x0 + j * cell:x0 + (j + 1) * cell] = 30
        corners = find_chessboard_corners(img, bw, bh)
        ok, ref = cv2.findChessboardCorners(img, (bw, bh))
        assert corners is not None and ok
        ref = ref.reshape(-1, 2)
        from scipy.spatial.distance import cdist

        d = cdist(corners, ref)
        assert d.min(1).max() < 1.0

    def test_calibrate_element_posts_and_events(self):
        """Full flow: boards through cameracalibrate -> settings set,
        message posted, calibrated event sent upstream."""
        bw, bh = 9, 6
        frames = []
        for shift in range(3):
            img = np.full((H, W), 200, np.uint8)
            x0, y0, cell = 36 + shift * 6, 26 + shift * 4, 24
            for i in range(bh + 1):
                for j in range(bw + 1):
                    if (i + j) % 2 == 0:
                        img[y0 + i * cell:y0 + (i + 1) * cell,
                            x0 + j * cell:x0 + (j + 1) * cell] = 30
            frames.append((img, img, img))
        p, _ = run_frames(
            "cameracalibrate frame-count=3 show-corners=false",
            frames, w=W, h=H)
        calib = p.get_by_name_recurse_up("cameracalibrate0") \
            if hasattr(p, "get_by_name_recurse_up") else None
        msgs = [m for m in iter(lambda: p.bus.pop(), None)
                if m.type == "element"
                and m.data.get("name") == "camera-calibration"]
        assert msgs
        settings = msgs[-1].data["settings"]
        kd = deserialize_undistort_settings(settings)
        assert kd is not None
        assert kd[0].shape == (3, 3)


class TestDewarp:
    def test_output_dimensions(self):
        _, outs = run_frames(
            "dewarp inner-radius=0.1 outer-radius=0.4",
            [tuple(np.zeros((128, 128), np.uint8) for _ in range(4))],
            fmt="RGBA", w=128, h=128)
        # r1=12.8 r2=51.2: w = roundup8(2pi*32)=208, h = roundup8(38.4)
        assert outs[0][0].shape == (40, 208)

    def test_ring_unrolls_to_rows(self):
        """A bright ring at radius r maps to one horizontal band."""
        h = w = 128
        ys, xs = np.mgrid[0:h, 0:w]
        r = np.sqrt((xs - 64.0) ** 2 + (ys - 64.0) ** 2)
        ring = (np.abs(r - 32.0) < 2.0)
        img = np.where(ring, 255, 0).astype(np.uint8)
        a = np.full((h, w), 255, np.uint8)
        _, outs = run_frames(
            "dewarp inner-radius=0.1 outer-radius=0.4",
            [(img, img, img, a)], fmt="RGBA", w=w, h=h)
        out = outs[0][0]
        # radius 32 -> row (32-12.8)/(51.2-12.8)*40 = 20
        row_means = out.mean(1)
        assert row_means.argmax() in range(18, 23)
        assert row_means.max() > 200          # the whole row is lit
        assert row_means[:14].max() < 30      # far rows dark

    def test_double_panorama_mode(self):
        _, outs = run_frames(
            "dewarp inner-radius=0.1 outer-radius=0.4 "
            "display-mode=double-panorama",
            [tuple(np.zeros((128, 128), np.uint8) for _ in range(4))],
            fmt="RGBA", w=128, h=128)
        assert outs[0][0].shape == (80, 104)

    def test_passthrough_when_radii_equal(self):
        img = np.arange(64 * 64, dtype=np.uint8).reshape(64, 64)
        a = np.full((64, 64), 255, np.uint8)
        _, outs = run_frames("dewarp", [(img, img, img, a)],
                             fmt="RGBA", w=64, h=64)
        np.testing.assert_array_equal(outs[0][0], img)


class TestHaarEngine:
    def test_detects_bright_blobs(self, cascade_file):
        hc = HaarCascade(cascade_file)
        img = np.full((64, 96), 40, np.uint8)
        img[10:14, 18:22] = 250
        img[28:36, 56:64] = 250
        hits = hc.detect_multi_scale(img, 1.1, 1)
        assert any(abs(x - 16) < 4 and abs(y - 8) < 4
                   for (x, y, _, _) in hits)
        assert any(abs(x - 52) < 6 and abs(y - 24) < 6
                   for (x, y, _, _) in hits)

    def test_group_rectangles(self):
        rects = [(10, 10, 20, 20), (11, 9, 20, 20), (10, 11, 21, 20),
                 (80, 80, 20, 20)]
        out = group_rectangles(rects, 2)
        assert len(out) == 1
        assert abs(out[0][0] - 10) <= 1

    def test_min_neighbors_filters(self):
        rects = [(10, 10, 20, 20), (80, 80, 20, 20)]
        assert group_rectangles(rects, 2) == []


class TestCascadeElements:
    def _blob_frames(self, x, y, size=12, w=96, h=64):
        img = np.full((h, w), 40, np.uint8)
        img[y:y + size, x:x + size] = 250
        return [(img, img.copy(), img.copy())]

    def test_facedetect_posts_message(self, cascade_file):
        p, outs = run_frames(
            f"facedetect profile={cascade_file} min-neighbors=1 "
            f"min-size-width=0 min-size-height=0 display=false",
            self._blob_frames(40, 24), w=96, h=64)
        msgs = [m for m in iter(lambda: p.bus.pop(), None)
                if m.type == "element"
                and m.data.get("name") == "facedetect"]
        assert msgs
        faces = msgs[-1].data["faces"]
        assert faces
        f = faces[0]
        cx = f["x"] + f["width"] / 2
        cy = f["y"] + f["height"] / 2
        assert abs(cx - 46) < 8 and abs(cy - 30) < 8

    def test_facedetect_display_draws(self, cascade_file):
        _, outs = run_frames(
            f"facedetect profile={cascade_file} min-neighbors=1 "
            f"min-size-width=0 min-size-height=0",
            self._blob_frames(40, 24), w=96, h=64)
        r, g = outs[0][0], outs[0][1]
        assert ((r == 255) & (g == 32)).any()    # ellipse color

    def test_facedetect_updates_none(self, cascade_file):
        p, _ = run_frames(
            f"facedetect profile={cascade_file} min-neighbors=1 "
            f"updates=none display=false", self._blob_frames(40, 24),
            w=96, h=64)
        msgs = [m for m in iter(lambda: p.bus.pop(), None)
                if m.type == "element"
                and m.data.get("name") == "facedetect"]
        assert not msgs

    def test_faceblur_blurs_region(self, cascade_file):
        img = np.full((64, 96), 40, np.uint8)
        img[:8, :8] = np.arange(64, dtype=np.uint8).reshape(8, 8)
        img[24:36, 40:52] = 250                  # detectable blob
        frames = [(img, img.copy(), img.copy())]
        _, outs = run_frames(
            f"faceblur profile={cascade_file} min-neighbors=1 "
            f"min-size-width=0 min-size-height=0", frames, w=96, h=64)
        out = outs[0][0]
        # pixels inside the detected box changed (blurred)
        assert (out[24:36, 40:52] != img[24:36, 40:52]).any()
        # pixels far away untouched
        np.testing.assert_array_equal(out[:8, :8], img[:8, :8])

    def test_handdetect_posts_gesture(self, cascade_file):
        p, _ = run_frames(
            f"handdetect profile-fist={cascade_file} display=false",
            self._blob_frames(40, 24), w=96, h=64)
        msgs = [m for m in iter(lambda: p.bus.pop(), None)
                if m.type == "element"
                and m.data.get("name") == "hand_detect"]
        assert msgs
        assert msgs[0].data["gesture"] == "fist"

    def test_missing_profile_passthrough(self):
        img = np.arange(64 * 96, dtype=np.uint8).reshape(64, 96) % 251
        _, outs = run_frames("facedetect profile=/nonexistent.xml",
                             [(img, img.copy(), img.copy())],
                             w=96, h=64)
        np.testing.assert_array_equal(outs[0][0], img)
