"""Overlay composition: exact video-blend.c semantics + element wiring."""

import numpy as np
import pytest

from gstreamer_tpu.video.overlay import (VideoOverlayComposition,
                                         VideoOverlayRectangle,
                                         scale_linear_rgba, video_blend)


def _blend_gold(dest_argb, src_argb, x, y, global_alpha=1.0,
                src_pre=False, dest_pre=False):
    """Scalar transliteration of video-blend.c BLENDLOOP (8-bit)."""
    dest = dest_argb.astype(np.int64).copy()
    h, w = src_argb.shape[:2]
    dh, dw = dest.shape[:2]
    alpha_val = int(np.float32(255.0) * np.float32(global_alpha))
    for i in range(h):
        di = y + i
        if di < 0 or di >= dh:
            continue
        for j in range(w):
            dj = x + j
            if dj < 0 or dj >= dw:
                continue
            sa = int(src_argb[i, j, 0])
            asrc = sa * alpha_val // 255
            if asrc == 0:
                continue
            adst = int(dest[di, dj, 0])
            final_alpha = asrc + adst * (255 - asrc) // 255
            dest[di, dj, 0] = final_alpha
            if final_alpha == 0:
                final_alpha = 1
            for c in (1, 2, 3):
                ca = int(src_argb[i, j, c])
                cb = int(dest[di, dj, c])
                if src_pre and dest_pre:
                    v = (ca * alpha_val + cb * (255 - asrc)) // 255
                elif not src_pre and dest_pre:
                    v = (ca * asrc + cb * (255 - asrc)) // 255
                elif src_pre:
                    v = (ca * alpha_val + cb * adst * (255 - asrc) // 255) \
                        // final_alpha
                else:
                    v = (ca * asrc + cb * adst * (255 - asrc) // 255) \
                        // final_alpha
                dest[di, dj, c] = min(v, 255)
    return dest


def _chans_from_argb(img):
    return tuple(img[..., c].astype(np.int32) for c in range(4))


def _argb_from_chans(chans):
    return np.stack(chans, axis=-1)


class TestVideoBlend:
    @pytest.mark.parametrize("src_pre,dest_pre", [
        (False, False), (True, False), (False, True), (True, True)])
    def test_over_operators_match_gold(self, src_pre, dest_pre):
        rng = np.random.RandomState(7)
        dest = rng.randint(0, 256, (20, 24, 4)).astype(np.uint8)
        src = rng.randint(0, 256, (8, 10, 4)).astype(np.uint8)
        gold = _blend_gold(dest, src, 3, 5, 1.0, src_pre, dest_pre)
        out = video_blend(np, _chans_from_argb(dest), True, src, 3, 5, 1.0,
                          src_premultiplied=src_pre,
                          dest_premultiplied=dest_pre)
        assert np.array_equal(_argb_from_chans(out), gold)

    def test_global_alpha_and_clipping(self):
        rng = np.random.RandomState(11)
        dest = rng.randint(0, 256, (16, 16, 4)).astype(np.uint8)
        src = rng.randint(0, 256, (12, 12, 4)).astype(np.uint8)
        for x, y in [(-4, -3), (10, 12), (2, 2)]:
            gold = _blend_gold(dest, src, x, y, 0.5)
            out = video_blend(np, _chans_from_argb(dest), True, src, x, y, 0.5)
            assert np.array_equal(_argb_from_chans(out), gold), (x, y)

    def test_fully_outside_is_noop(self):
        dest = np.full((8, 8, 4), 77, np.uint8)
        src = np.full((4, 4, 4), 255, np.uint8)
        out = video_blend(np, _chans_from_argb(dest), True, src, 8, 0)
        assert np.array_equal(_argb_from_chans(out), dest)

    def test_zero_alpha_pixels_untouched(self):
        dest = np.full((8, 8, 4), 100, np.uint8)
        src = np.zeros((4, 4, 4), np.uint8)   # alpha 0 everywhere
        src[..., 1:] = 255
        out = video_blend(np, _chans_from_argb(dest), True, src, 0, 0)
        assert np.array_equal(_argb_from_chans(out), dest)

    def test_rgb_overlay_on_yuv_uses_fixed_matrix(self):
        # opaque red overlay on a YUV dest: y=(47*255+4096)>>8 = 62
        dest = np.zeros((4, 4, 4), np.uint8)
        dest[..., 0] = 255
        src = np.zeros((2, 2, 4), np.uint8)
        src[..., 0] = 255   # opaque
        src[..., 1] = 255   # red
        out = video_blend(np, _chans_from_argb(dest), False, src, 0, 0)
        img = _argb_from_chans(out)
        assert img[0, 0, 1] == (47 * 255 + 4096) >> 8
        assert img[0, 0, 3] == min((112 * 255 + 32768) >> 8, 255)


class TestScaleLinearRGBA:
    def test_identity(self):
        img = np.random.RandomState(0).randint(0, 256, (6, 7, 4)).astype(np.uint8)
        assert scale_linear_rgba(img, 7, 6) is img

    def test_constant_preserved(self):
        img = np.full((5, 5, 4), 123, np.uint8)
        out = scale_linear_rgba(img, 13, 9)
        assert out.shape == (9, 13, 4)
        assert np.all(out == 123)

    def test_corners_exact(self):
        # the 16.16 increment maps first output sample to first input
        img = np.arange(4 * 4 * 4, dtype=np.uint8).reshape(4, 4, 4)
        out = scale_linear_rgba(img, 8, 8)
        assert np.array_equal(out[0, 0], img[0, 0])

    def test_upscale_2x1d_midpoint(self):
        img = np.zeros((1, 2, 4), np.uint8)
        img[0, 0] = 0
        img[0, 1] = 200
        out = scale_linear_rgba(img, 3, 1)
        # x_inc = ((2-1)<<16)/(3-1)-1 = 32767; weights (tmp>>8)&0xff
        t1 = 32767
        f = (t1 >> 8) & 0xFF
        assert out[0, 1, 0] == (0 * (256 - f) + 200 * f) >> 8


class TestOverlayElement:
    def test_overlaycomposition_blends(self):
        from gstreamer_tpu.core.parse import parse_launch
        pipe = parse_launch(
            "videotestsrc pattern=black num-buffers=1 ! "
            "video/x-raw,format=RGBA,width=32,height=16 ! "
            "overlaycomposition name=oc ! appsink name=out")
        oc = pipe.get_by_name("oc")
        px = np.zeros((4, 8, 4), np.uint8)
        px[..., 0] = 255   # opaque
        px[..., 1] = 200   # red-ish
        oc.composition = VideoOverlayComposition(
            [VideoOverlayRectangle(px, render_x=4, render_y=2)])
        pipe.run()
        sample = pipe.get_by_name("out").pull_sample()
        r = np.asarray(sample.buffer.data[0])[0]
        a = np.asarray(sample.buffer.data[3])[0]
        assert r[2, 4] == 200            # R inside rect
        assert r[0, 0] == 0              # untouched outside
        assert a[2, 4] == 255

    def test_draw_callback_per_buffer(self):
        from gstreamer_tpu.core.parse import parse_launch
        pipe = parse_launch(
            "videotestsrc pattern=black num-buffers=2 ! "
            "video/x-raw,format=RGBA,width=16,height=8 ! "
            "overlaycomposition name=oc ! appsink name=out")
        oc = pipe.get_by_name("oc")
        calls = []

        def draw(buf):
            calls.append(buf.pts)
            px = np.full((2, 2, 4), 255, np.uint8)
            return VideoOverlayComposition([VideoOverlayRectangle(px)])

        oc.draw = draw
        pipe.run()
        assert len(calls) >= 1
        r = np.asarray(pipe.get_by_name("out").pull_sample().buffer.data[0])[0]
        assert r[0, 0] == 255
