"""PNG + baseline JPEG codecs and elements, verified against Pillow as
an independent oracle (the codecs themselves are native — codecs/png.py
over zlib, codecs/jpeg.py with device-side DCT/IDCT matmuls)."""

import io

import numpy as np
import pytest

from gstreamer_tpu.codecs import (jpeg_decode, jpeg_encode, png_decode,
                                  png_encode)
from gstreamer_tpu.core.parse import parse_launch

PIL = pytest.importorskip("PIL.Image")

RNG = np.random.default_rng(11)


class TestPngCodec:
    @pytest.mark.parametrize("shape,fmt,mode", [
        ((40, 56, 3), "RGB", "RGB"),
        ((40, 56, 4), "RGBA", "RGBA"),
        ((40, 56), "GRAY8", "L"),
    ])
    def test_lossless_vs_pillow(self, shape, fmt, mode):
        img = RNG.integers(0, 256, size=shape).astype(np.uint8)
        # ours -> Pillow
        data = png_encode(img, fmt)
        pil = np.asarray(PIL.open(io.BytesIO(data)))
        np.testing.assert_array_equal(pil.reshape(img.shape), img)
        # Pillow -> ours (exercises all five filters via Pillow's
        # adaptive filtering)
        b = io.BytesIO()
        PIL.fromarray(img, mode).save(b, "PNG")
        fmt2, dec = png_decode(b.getvalue())
        assert fmt2 == fmt
        np.testing.assert_array_equal(dec.reshape(img.shape), img)

    def test_natural_image_roundtrip(self):
        yy, xx = np.mgrid[0:64, 0:80]
        img = np.stack([(xx * 3) % 256, (yy * 5) % 256,
                        ((xx + yy) * 2) % 256], -1).astype(np.uint8)
        fmt, dec = png_decode(png_encode(img, "RGB"))
        np.testing.assert_array_equal(dec, img)


class TestJpegCodec:
    def _test_image(self, h, w):
        yy, xx = np.mgrid[0:h, 0:w]
        y = (128 + 100 * np.sin(xx / 6) * np.cos(yy / 7)).astype(np.uint8)
        u = ((xx[::2, ::2] * 2) % 200 + 28).astype(np.uint8)
        v = ((yy[::2, ::2] * 3) % 200 + 28).astype(np.uint8)
        return y, u, v

    def test_pillow_decodes_ours_420(self):
        y, u, v = self._test_image(48, 64)
        data = jpeg_encode((y, u, v), 64, 48, quality=92,
                           subsampling="420")
        pil = PIL.open(io.BytesIO(data))
        assert pil.size == (64, 48)
        ycc = np.asarray(pil.convert("YCbCr")).astype(int)
        # Pillow converts through clipped RGB; the synthetic chroma makes
        # that lossy, so the tolerance is loose (self-roundtrip pins the
        # codec tightly below)
        assert np.abs(ycc[..., 0] - y.astype(int)).mean() < 6

    def test_we_decode_pillow(self):
        y, _, _ = self._test_image(48, 64)
        rgb = np.stack([y, np.roll(y, 3, 1), 255 - y], -1)
        b = io.BytesIO()
        PIL.fromarray(rgb, "RGB").save(b, "JPEG", quality=92)
        planes, w, h, sub = jpeg_decode(b.getvalue())
        assert (w, h) == (64, 48)
        pil_y = np.asarray(PIL.open(b).convert("YCbCr"))[..., 0]
        assert np.abs(planes[0].astype(int)
                      - pil_y.astype(int)).max() <= 2

    def test_self_roundtrip_quality(self):
        y, u, v = self._test_image(48, 64)
        data = jpeg_encode((y, u, v), 64, 48, quality=92,
                           subsampling="420")
        planes, w, h, sub = jpeg_decode(data)
        assert sub == "420"
        assert np.abs(planes[0].astype(int) - y.astype(int)).max() <= 6
        assert np.abs(planes[1].astype(int) - u.astype(int)).mean() < 4

    def test_non_multiple_of_16(self):
        y, u, v = self._test_image(50, 70)
        u = u[:25, :35]
        v = v[:25, :35]
        data = jpeg_encode((y, u, v), 70, 50, quality=90,
                           subsampling="420")
        pil = PIL.open(io.BytesIO(data))
        assert pil.size == (70, 50)
        planes, w, h, sub = jpeg_decode(data)
        assert (w, h) == (70, 50)
        assert planes[0].shape == (50, 70)

    def test_gray(self):
        y, _, _ = self._test_image(40, 40)
        data = jpeg_encode((y,), 40, 40, quality=95)
        planes, w, h, sub = jpeg_decode(data)
        assert sub == "gray"
        assert np.abs(planes[0].astype(int) - y.astype(int)).max() <= 4

    def test_444(self):
        h, w = 32, 32
        y, _, _ = self._test_image(h, w)
        u = ((np.mgrid[0:h, 0:w][1]) % 256).astype(np.uint8)
        v = 255 - u
        data = jpeg_encode((y, u, v), w, h, quality=95,
                           subsampling="444")
        planes, _, _, sub = jpeg_decode(data)
        assert sub == "444"
        assert np.abs(planes[1].astype(int) - u.astype(int)).max() <= 8


class TestElements:
    def test_png_file_roundtrip(self, tmp_path):
        pat = tmp_path / "f%03d.png"
        p = parse_launch(
            "videotestsrc num-buffers=3 pattern=gradient ! "
            "video/x-raw,format=RGB,width=48,height=32,framerate=10/1 ! "
            f"pngenc ! multifilesink location={pat}")
        p.run()
        assert (tmp_path / "f000.png").exists()
        pil = np.asarray(PIL.open(tmp_path / "f001.png"))
        assert pil.shape == (32, 48, 3)
        # decode pipeline: caps negotiated by peeking at the file header
        p2 = parse_launch(
            f"multifilesrc location={pat} ! pngdec ! appsink name=out")
        p2.run()
        sink = p2.get_by_name("out")
        frames = []
        while True:
            s = sink.pull_sample()
            if s is None:
                break
            d = [np.asarray(x) for x in s.buffer.data]
            for k in range(d[0].shape[0]):
                frames.append(tuple(x[k] for x in d))
        assert len(frames) == 3
        np.testing.assert_array_equal(
            np.stack(frames[1], -1), pil)

    def test_jpeg_pipeline_roundtrip(self, tmp_path):
        pat = tmp_path / "j%03d.jpg"
        p = parse_launch(
            "videotestsrc num-buffers=2 pattern=smpte75 ! "
            "video/x-raw,format=I420,width=64,height=48,framerate=10/1 ! "
            f"jpegenc quality=95 ! multifilesink location={pat}")
        p.run()
        pil = PIL.open(tmp_path / "j000.jpg")
        assert pil.size == (64, 48)
        p2 = parse_launch(
            f"multifilesrc location={pat} ! jpegdec ! "
            "videoconvert ! video/x-raw,format=RGB ! appsink name=out")
        p2.run()
        sink = p2.get_by_name("out")
        s = sink.pull_sample()
        assert s is not None
        r = np.asarray(s.buffer.data[0])[0]
        assert r.shape == (48, 64)
        # smpte75 bars: leftmost bar is white-ish, distinct from the
        # rightmost (blue) bar
        assert r[:, :5].mean() > 150 > r[:, -5:].mean()


class TestNativeEntropyCodec:
    """native/gtpu_jpeg.cpp Huffman coder must be bit-identical to the
    Python gold path (both directions, all subsamplings)."""

    def _image(self, h, w):
        yy, xx = np.mgrid[0:h, 0:w]
        y = (128 + 100 * np.sin(xx / 6) * np.cos(yy / 7)).astype(np.uint8)
        u = ((xx[::2, ::2] * 2) % 200 + 28).astype(np.uint8)
        v = ((yy[::2, ::2] * 3) % 200 + 28).astype(np.uint8)
        return y, u, v

    @pytest.mark.parametrize("sub", ["420", "444", "gray"])
    def test_bit_identical(self, sub):
        import gstreamer_tpu.native.jpeg as njm
        if not njm.available():
            pytest.skip("native toolchain unavailable")
        h, w = 64, 80
        y, u, v = self._image(h, w)
        if sub == "gray":
            planes = (y,)
        elif sub == "444":
            uu = ((np.mgrid[0:h, 0:w][1]) % 256).astype(np.uint8)
            planes = (y, uu, 255 - uu)
        else:
            planes = (y, u, v)
        data_native = jpeg_encode(planes, w, h, quality=90,
                                  subsampling="420" if sub == "gray"
                                  else sub)
        dec_native = jpeg_decode(data_native)
        # force the Python fallback
        saved = (njm._lib, njm._tried)
        njm._lib, njm._tried = None, True
        try:
            data_py = jpeg_encode(planes, w, h, quality=90,
                                  subsampling="420" if sub == "gray"
                                  else sub)
            dec_py = jpeg_decode(data_native)
        finally:
            njm._lib, njm._tried = saved
        assert data_native == data_py
        for a, b in zip(dec_native[0], dec_py[0]):
            np.testing.assert_array_equal(a, b)
