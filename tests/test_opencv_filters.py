"""OpenCV-analog filter family: bit-parity vs the system cv2 oracle
plus fused device-path pipeline tests.

The reference elements (gst-plugins-bad/ext/opencv/) call straight
into OpenCV, so the strongest possible parity statement is equality
against cv2 itself.  Kernels pinned bit-exact: rgb2gray, rgb2hsv,
Sobel/Laplacian (CV_8U, k 1/3/5/7), equalizeHist, erode/dilate,
odd-kernel box blur, fixed-kernel gaussian, median.  Documented
tolerances: Canny is bit-exact outside an aperture/2+1 border frame
(cv2 5.x gradient border handling differs), arbitrary-sigma u8
gaussian and bilateral are +-1 (cv2 rounds through float32 per pass).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.element import element_factory_make as make
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.ops import cv_kernels as cvk

cv2 = pytest.importorskip("cv2")

RNG = np.random.default_rng(1234)
GRAY = RNG.integers(0, 256, (48, 64), np.uint8)
RGB = RNG.integers(0, 256, (48, 64, 3), np.uint8)


def run_element(factory, planes, fmt="RGB", **props):
    """Drive one element's fused device path through a real pipeline."""
    h, w = planes[0].shape
    src_fmt = fmt
    p = parse_launch(
        f"appsrc name=in ! video/x-raw, format={src_fmt}, width={w}, "
        f"height={h}, framerate=30/1 ! {factory} "
        + " ".join(f"{k}={v}" for k, v in props.items())
        + " ! appsink name=out")
    data = tuple(pl[None] for pl in planes)
    p.get_by_name("in").push_buffer(Buffer(data=data, batch=1))
    p.get_by_name("in").end_of_stream()
    p.run()
    s = p.get_by_name("out").pull_sample()
    return [np.asarray(x)[0] for x in s.buffer.data]


def rgb_planes(img):
    return (img[..., 0], img[..., 1], img[..., 2])


class TestKernelParity:
    def test_rgb2gray_bit_exact(self):
        got = cvk.rgb2gray_u8(np, *rgb_planes(RGB))
        ref = cv2.cvtColor(RGB, cv2.COLOR_RGB2GRAY)
        np.testing.assert_array_equal(got, ref)

    def test_rgb2hsv_bit_exact(self):
        h, s, v = cvk.rgb2hsv_u8(np, *rgb_planes(RGB))
        ref = cv2.cvtColor(RGB, cv2.COLOR_RGB2HSV)
        np.testing.assert_array_equal(np.stack([h, s, v], -1), ref)

    @pytest.mark.parametrize("dx,dy,ks", [(1, 0, 3), (0, 1, 3),
                                          (1, 1, 5), (2, 0, 7),
                                          (1, 0, 1)])
    def test_sobel_bit_exact(self, dx, dy, ks):
        got = cvk.sobel_u8(np, GRAY, dx, dy, ks)
        ref = cv2.Sobel(GRAY, cv2.CV_8U, dx, dy, ksize=ks)
        np.testing.assert_array_equal(got, ref)

    @pytest.mark.parametrize("ks", [1, 3, 5, 7])
    def test_laplacian_bit_exact(self, ks):
        got = cvk.laplacian_u8(np, GRAY, ks)
        ref = cv2.Laplacian(GRAY, cv2.CV_8U, ksize=ks)
        np.testing.assert_array_equal(got, ref)

    def test_laplacian_scale_shift(self):
        got = cvk.laplacian_u8(np, GRAY, 3, scale=2.0, shift=10.0)
        inter = cv2.Laplacian(GRAY, cv2.CV_8U, ksize=3)
        ref = np.clip(np.floor(inter.astype(np.float64) * 2.0 + 10.0
                               + 0.5), 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(got, ref)

    def test_equalize_hist_bit_exact(self):
        got = cvk.equalize_hist_u8(np, GRAY)
        np.testing.assert_array_equal(got, cv2.equalizeHist(GRAY))

    @pytest.mark.parametrize("iters", [1, 2, 3])
    def test_erode_dilate_bit_exact(self, iters):
        np.testing.assert_array_equal(
            cvk.erode_u8(np, GRAY, iters),
            cv2.erode(GRAY, None, iterations=iters))
        np.testing.assert_array_equal(
            cvk.dilate_u8(np, GRAY, iters),
            cv2.dilate(GRAY, None, iterations=iters))

    @pytest.mark.parametrize("kw,kh", [(3, 3), (5, 3), (7, 7)])
    def test_box_blur_odd_bit_exact(self, kw, kh):
        got = cvk.box_blur_u8(np, GRAY, kw, kh)
        np.testing.assert_array_equal(got, cv2.blur(GRAY, (kw, kh)))

    def test_box_blur_even_within_1(self):
        got = cvk.box_blur_u8(np, GRAY, 4, 4)
        ref = cv2.blur(GRAY, (4, 4))
        assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1

    @pytest.mark.parametrize("ks", [3, 5, 7])
    def test_gaussian_fixed_bit_exact(self, ks):
        got = cvk.gaussian_blur_u8(np, GRAY, ks)
        np.testing.assert_array_equal(
            got, cv2.GaussianBlur(GRAY, (ks, ks), 0))

    @pytest.mark.parametrize("ks,sig", [(7, 1.5), (31, 5.0), (9, 0.0)])
    def test_gaussian_float_within_1(self, ks, sig):
        got = cvk.gaussian_blur_u8(np, GRAY, ks, sigma=sig)
        ref = cv2.GaussianBlur(GRAY, (ks, ks), sig)
        assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1

    @pytest.mark.parametrize("ks", [3, 5])
    def test_median_bit_exact(self, ks):
        np.testing.assert_array_equal(
            cvk.median_blur_u8(np, GRAY, ks), cv2.medianBlur(GRAY, ks))

    def test_median_3ch_bit_exact(self):
        got = np.stack([cvk.median_blur_u8(np, RGB[..., c], 3)
                        for c in range(3)], -1)
        np.testing.assert_array_equal(got, cv2.medianBlur(RGB, 3))

    def test_bilateral_smooth_content_close_to_cv2(self):
        """cv2 5.x ships a fixed-point approximated bilateral; ours is
        the published float algorithm.  On smooth content (where the
        range kernel is near-uniform) the two agree within +-2; the
        edge-preservation property is asserted separately."""
        ramp = np.clip(np.add.outer(np.arange(48), np.arange(64)),
                       0, 255).astype(np.uint8)
        img = np.stack([ramp, ramp[::-1], ramp], -1)
        got = cvk.bilateral_u8(np, rgb_planes(img), 30.0, 0.0)
        ref = cv2.bilateralFilter(img, -1, 30.0, 0.0)
        d = np.abs(np.stack(got, -1).astype(int) - ref.astype(int))
        assert d.max() <= 2

    def test_bilateral_preserves_edges_smooths_noise(self):
        step = np.full((32, 32), 40, np.uint8)
        step[:, 16:] = 200
        noisy = np.clip(step.astype(int)
                        + RNG.integers(-6, 7, step.shape),
                        0, 255).astype(np.uint8)
        out, = cvk.bilateral_u8(np, (noisy,), 25.0, 0.0)
        # noise reduced on each side of the edge
        assert out[:, :13].std() < noisy[:, :13].std()
        assert out[:, 19:].std() < noisy[:, 19:].std()
        # edge magnitude preserved (no blur across the step)
        jump = out[:, 16].astype(int) - out[:, 15].astype(int)
        assert (jump > 120).all()

    @pytest.mark.parametrize("t1,t2,ap", [(40, 120, 3), (100, 50, 3),
                                          (30, 90, 5), (20, 60, 7)])
    def test_canny_interior_bit_exact(self, t1, t2, ap):
        got = cvk.canny(np, GRAY, t1, t2, ap)
        ref = cv2.Canny(GRAY, t1, t2, apertureSize=ap)
        frame = ap // 2 + 1
        np.testing.assert_array_equal(got[frame:-frame, frame:-frame],
                                      ref[frame:-frame, frame:-frame])
        agree = (got == ref).mean()
        assert agree > 0.93

    def test_canny_l2(self):
        got = cvk.canny(np, GRAY, 1000, 3000, 3, l2gradient=True)
        ref = cv2.Canny(GRAY, 1000, 3000, apertureSize=3,
                        L2gradient=True)
        np.testing.assert_array_equal(got[2:-2, 2:-2], ref[2:-2, 2:-2])


class TestDevicePathMatchesNumpy:
    """The jnp path must agree with the numpy gold bit-for-bit."""

    def test_canny_device(self):
        got = np.asarray(cvk.canny(jnp, jnp.asarray(GRAY), 40, 120, 3))
        gold = cvk.canny(np, GRAY, 40, 120, 3)
        np.testing.assert_array_equal(got, gold)

    def test_equalize_hist_device(self):
        batch = np.stack([GRAY, GRAY[::-1]])
        got = np.asarray(cvk.equalize_hist_u8(jnp, jnp.asarray(batch)))
        gold = cvk.equalize_hist_u8(np, batch)
        np.testing.assert_array_equal(got, gold)

    def test_sobel_device(self):
        got = np.asarray(cvk.sobel_u8(jnp, jnp.asarray(GRAY), 1, 0, 3))
        np.testing.assert_array_equal(got, cvk.sobel_u8(np, GRAY, 1, 0,
                                                        3))


class TestElements:
    def test_edgedetect_map_mode(self):
        out = run_element("edgedetect", rgb_planes(RGB), mask="false",
                          threshold1=40, threshold2=120)
        ref = cv2.Canny(cv2.cvtColor(RGB, cv2.COLOR_RGB2GRAY), 40, 120,
                        apertureSize=3)
        for pl in out:
            np.testing.assert_array_equal(pl[2:-2, 2:-2],
                                          ref[2:-2, 2:-2])

    def test_edgedetect_mask_mode(self):
        out = run_element("edgedetect", rgb_planes(RGB),
                          threshold1=40, threshold2=120)
        edge = cvk.canny(np, cvk.rgb2gray_u8(np, *rgb_planes(RGB)),
                         40, 120, 3)
        for c, pl in enumerate(out):
            np.testing.assert_array_equal(
                pl, np.where(edge != 0, RGB[..., c], 0))

    def test_cvsobel_element(self):
        out = run_element("cvsobel", rgb_planes(RGB), mask="false")
        ref = cv2.Sobel(cv2.cvtColor(RGB, cv2.COLOR_RGB2GRAY),
                        cv2.CV_8U, 1, 0, ksize=3)
        np.testing.assert_array_equal(out[0], ref)

    def test_cvlaplace_element(self):
        out = run_element("cvlaplace", rgb_planes(RGB), mask="false")
        ref = cv2.Laplacian(cv2.cvtColor(RGB, cv2.COLOR_RGB2GRAY),
                            cv2.CV_8U, ksize=3)
        np.testing.assert_array_equal(out[0], ref)

    def test_cvdilate_gray(self):
        out = run_element("cvdilate", (GRAY,), fmt="GRAY8",
                          iterations=2)
        np.testing.assert_array_equal(
            out[0], cv2.dilate(GRAY, None, iterations=2))

    def test_cverode_rgb(self):
        out = run_element("cverode", rgb_planes(RGB))
        ref = cv2.erode(RGB, None, iterations=1)
        np.testing.assert_array_equal(np.stack(out, -1), ref)

    def test_cvequalizehist(self):
        out = run_element("cvequalizehist", (GRAY,), fmt="GRAY8")
        np.testing.assert_array_equal(out[0], cv2.equalizeHist(GRAY))

    def test_cvsmooth_gaussian_default(self):
        out = run_element("cvsmooth", rgb_planes(RGB))
        ref = cv2.GaussianBlur(RGB, (3, 3), 0)
        np.testing.assert_array_equal(np.stack(out, -1), ref)

    def test_cvsmooth_median(self):
        out = run_element("cvsmooth", rgb_planes(RGB), type="median",
                          **{"kernel-width": 5})
        np.testing.assert_array_equal(np.stack(out, -1),
                                      cv2.medianBlur(RGB, 5))

    def test_cvsmooth_roi(self):
        """Smoothing restricted to a rectangle: outside passes
        through, inside equals the ROI-submatrix blur (the reference
        smooths the submatrix view, so borders reflect at the ROI
        edge)."""
        out = run_element("cvsmooth", rgb_planes(RGB), type="blur",
                          **{"position-x": 8, "position-y": 8,
                             "width": 16, "height": 12})
        got = np.stack(out, -1)
        np.testing.assert_array_equal(got[:8, :], RGB[:8, :])
        np.testing.assert_array_equal(got[:, :8], RGB[:, :8])
        np.testing.assert_array_equal(got[20:, :], RGB[20:, :])
        roi = RGB[8:20, 8:24]
        ref_roi = cv2.blur(roi, (3, 3))
        np.testing.assert_array_equal(got[8:20, 8:24], ref_roi)

    def test_cvsmooth_roi_outside_passthrough(self):
        out = run_element("cvsmooth", rgb_planes(RGB), type="blur",
                          **{"position-x": 1000})
        np.testing.assert_array_equal(np.stack(out, -1), RGB)

    def test_skindetect_hsv_matches_cv_recipe(self):
        out = run_element("skindetect", rgb_planes(RGB),
                          postprocess="false")
        hsv = cv2.cvtColor(RGB, cv2.COLOR_RGB2HSV)
        h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
        hlo = np.where(h > 10, 255, 0).astype(np.uint8)
        hhi = np.where(h > 20, 0, 255).astype(np.uint8)
        hhi = cv2.erode(hhi, None, iterations=1)
        m = (hhi & np.where(s > 48, 255, 0).astype(np.uint8)
             & hlo & np.where(v > 80, 255, 0).astype(np.uint8))
        np.testing.assert_array_equal(out[0], m)
        np.testing.assert_array_equal(out[1], m)

    def test_skindetect_rgb_method(self):
        out = run_element("skindetect", rgb_planes(RGB), method="rgb",
                          postprocess="false")
        r = RGB[..., 0].astype(np.float32)
        g = RGB[..., 1].astype(np.float32)
        allf = r + g + RGB[..., 2].astype(np.float32)
        rp = np.where(allf == 0, 0, r / np.where(allf == 0, 1, allf))
        gp = np.where(allf == 0, 0, g / np.where(allf == 0, 1, allf))
        skin = ((r > 60) & (rp > 0.42) & ~(rp > 0.6) & (gp > 0.28)
                & ~(gp > 0.4))
        np.testing.assert_array_equal(out[0],
                                      np.where(skin, 255, 0))

    def test_retinex_basic_vs_cv2(self):
        img = RNG.integers(1, 256, (32, 40, 3), np.uint8)  # avoid log0
        out = run_element("retinex", rgb_planes(img), sigma=2.0)
        f = img.astype(np.float32)
        size = int(2.0 * 6) // 2 * 2 + 1
        blur = cv2.GaussianBlur(f, (size, size), 0)
        o = np.log(f) - np.log(blur)
        ref = np.clip(np.floor(o * 128.0 + 128.0 + 0.5), 0,
                      255).astype(np.uint8)
        d = np.abs(np.stack(out, -1).astype(int) - ref.astype(int))
        assert d.max() <= 1

    def test_retinex_multiscale_runs(self):
        img = RNG.integers(1, 256, (24, 24, 3), np.uint8)
        out = run_element("retinex", rgb_planes(img),
                          method="multiscale", scales=2)
        assert out[0].shape == (24, 24)
        assert out[0].std() > 0

    def test_opencvtextoverlay(self):
        img = np.zeros((60, 160, 3), np.uint8)
        out = run_element("opencvtextoverlay", rgb_planes(img),
                          text="Hi", colorR=200, colorG=10, colorB=30)
        got = np.stack(out, -1)
        drawn = (got != 0).any(-1)
        assert drawn.any()
        ys, xs = np.nonzero(drawn)
        assert xs.min() >= 50                   # xpos
        assert ys.max() <= 55                   # above baseline-ish
        np.testing.assert_array_equal(
            np.unique(got[drawn].reshape(-1, 3), axis=0),
            [[200, 10, 30]])

    def test_launch_chain_pipeline(self):
        """Two cv elements fused in one pipeline program."""
        p = parse_launch(
            "videotestsrc num-buffers=2 ! videoconvert ! "
            "video/x-raw, format=RGB, width=64, height=48 ! "
            "cvsmooth ! edgedetect mask=false ! appsink name=o")
        p.run()
        s = p.get_by_name("o").pull_sample()
        out = [np.asarray(x) for x in s.buffer.data]
        assert out[0].shape[-2:] == (48, 64)
        vals = np.unique(out[0])
        assert set(vals.tolist()) <= {0, 255}
