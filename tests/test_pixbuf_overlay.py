"""Image/vector overlay family: gdkpixbufdec/overlay/sink,
cairooverlay, qroverlay/debugqroverlay (QR validated against the cv2
decoder), rsvgdec/rsvgoverlay (reduced SVG)."""

import io
import json

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.element import element_factory_make as make
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.ops.qrencode import qr_encode

cv2 = pytest.importorskip("cv2")


def png_bytes(rgb):
    from gstreamer_tpu.codecs.png import png_encode

    return png_encode(rgb)


def run_video(launch, frames_planes, fmt="RGB", w=96, h=64,
              out_planes=3):
    p = parse_launch(
        f"appsrc name=in ! video/x-raw, format={fmt}, width={w}, "
        f"height={h}, framerate=30/1 ! {launch} ! appsink name=out")
    for i, planes in enumerate(frames_planes):
        p.get_by_name("in").push_buffer(Buffer(
            data=tuple(pl[None] for pl in planes), batch=1,
            pts=i * 33333333, duration=33333333))
    p.get_by_name("in").end_of_stream()
    p.run()
    outs = []
    while (s := p.get_by_name("out").pull_sample()) is not None:
        outs.append([np.asarray(x)[0] for x in s.buffer.data])
    return p, outs


def _qr_decode_any_scale(m):
    """cv2's detector fails on some (version, scale) combos even for
    cv2's own encoder output; try a few module scales."""
    det = cv2.QRCodeDetector()
    for scale in (8, 5, 6, 10):
        img = np.where(np.kron(m, np.ones((scale, scale), np.uint8)),
                       0, 255).astype(np.uint8)
        img = np.pad(img, 4 * scale, constant_values=255)
        val, _, _ = det.detectAndDecode(img)
        if val:
            return val
    return ""


class TestQrEncoder:
    @pytest.mark.parametrize("ec", "LMQH")
    def test_cv2_decodes(self, ec):
        for text in ("short", "a longer payload 1234567890" * 2,
                     "x" * 90):
            m = qr_encode(text.encode(), ec)
            assert _qr_decode_any_scale(m) == text, (ec, len(text))

    def test_version7_plus(self):
        """v7+ exercises the version-info Golay blocks."""
        text = "v" * 130
        m = qr_encode(text.encode(), "M")
        assert m.shape[0] >= 45                 # version >= 7
        assert _qr_decode_any_scale(m) == text


class TestGdkPixbufDec:
    def test_png_decode(self):
        rng = np.random.default_rng(0)
        rgb = rng.integers(0, 256, (20, 30, 3), np.uint8)
        data = png_bytes(rgb)
        e = make("gdkpixbufdec")
        out = e.host_process(Buffer(
            data=np.frombuffer(data, np.uint8), batch=1))
        got = np.stack([np.asarray(p)[0] for p in out.data], -1)
        np.testing.assert_array_equal(got[..., :3], rgb)
        assert (got[..., 3] == 255).all()

    def test_bmp_via_pil(self):
        from PIL import Image

        rng = np.random.default_rng(1)
        rgb = rng.integers(0, 256, (12, 16, 3), np.uint8)
        bio = io.BytesIO()
        Image.fromarray(rgb).save(bio, "BMP")
        e = make("gdkpixbufdec")
        out = e.host_process(Buffer(
            data=np.frombuffer(bio.getvalue(), np.uint8), batch=1))
        got = np.stack([np.asarray(p)[0] for p in out.data], -1)
        np.testing.assert_array_equal(got[..., :3], rgb)


class TestGdkPixbufOverlay:
    def _frame(self, w=96, h=64):
        return tuple(np.full((h, w), v, np.uint8)
                     for v in (10, 20, 30))

    def test_positioned_overlay(self, tmp_path):
        logo = np.zeros((16, 24, 3), np.uint8)
        logo[..., 0] = 250
        path = tmp_path / "logo.png"
        path.write_bytes(png_bytes(logo))
        _, outs = run_video(
            f"gdkpixbufoverlay location={path} offset-x=8 offset-y=4",
            [self._frame()])
        r = outs[0][0]
        assert (r[4:20, 8:32] > 200).all()
        assert (r[:4, :] == 10).all()
        assert (r[30:, :] == 10).all()

    def test_negative_offset_from_edge(self, tmp_path):
        logo = np.full((8, 8, 3), 200, np.uint8)
        path = tmp_path / "l.png"
        path.write_bytes(png_bytes(logo))
        _, outs = run_video(
            f"gdkpixbufoverlay location={path} offset-x=-4 "
            f"offset-y=-4", [self._frame()])
        r = outs[0][0]
        # 8x8 logo ends 4 px before the bottom-right corner
        assert (r[52:60, 84:92] > 150).all()
        assert (r[:50, :80] == 10).all()

    def test_alpha_blend(self, tmp_path):
        logo = np.full((8, 8, 3), 255, np.uint8)
        path = tmp_path / "a.png"
        path.write_bytes(png_bytes(logo))
        _, outs = run_video(
            f"gdkpixbufoverlay location={path} alpha=0.5",
            [self._frame()])
        r = outs[0][0]
        region = r[:8, :8]
        assert 100 < region.mean() < 180     # ~ (10+255)/2


class TestCairoOverlay:
    def test_draw_callback(self):
        p = parse_launch(
            "appsrc name=in ! video/x-raw, format=RGB, width=64, "
            "height=48, framerate=30/1 ! cairooverlay name=c ! "
            "appsink name=out")
        seen = []

        def draw(surface, pts, dur):
            seen.append(pts)
            surface[10:20, 10:30] = (0, 255, 0, 255)

        c = p.get_by_name("c")
        c.draw = draw
        frame = tuple(np.zeros((1, 48, 64), np.uint8)
                      for _ in range(3))
        p.get_by_name("in").push_buffer(Buffer(data=frame, batch=1,
                                               pts=0,
                                               duration=33333333))
        p.get_by_name("in").end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        g = np.asarray(s.buffer.data[1])[0]
        assert (g[10:20, 10:30] == 255).all()
        assert (g[0:5, :] == 0).all()
        assert seen == [0]


class TestQrOverlay:
    def _decode_region(self, planes):
        rgb = np.stack(planes, -1)
        gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
        val, _, _ = cv2.QRCodeDetector().detectAndDecode(gray)
        return val

    def test_qroverlay_scannable(self):
        frames = [tuple(np.full((1, 240, 320), 255, np.uint8)[0][None]
                        for _ in range(3))]
        frames = [tuple(np.full((240, 320), 255, np.uint8)[None]
                        for _ in range(3))]
        p = parse_launch(
            "appsrc name=in ! video/x-raw, format=RGB, width=320, "
            "height=240, framerate=30/1 ! qroverlay data=hello-qr "
            "pixel-size=4 ! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(
            data=frames[0], batch=1, pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        planes = [np.asarray(x)[0] for x in s.buffer.data]
        assert self._decode_region(planes) == "hello-qr"

    def test_debugqroverlay_json(self):
        frames = [tuple(np.full((240, 320), 255, np.uint8)[None]
                        for _ in range(3)) for _ in range(2)]
        p = parse_launch(
            "appsrc name=in ! video/x-raw, format=RGB, width=320, "
            "height=240, framerate=30/1 ! debugqroverlay "
            "pixel-size=4 ! appsink name=out")
        for i, f in enumerate(frames):
            p.get_by_name("in").push_buffer(Buffer(
                data=f, batch=1, pts=i * 33333333,
                duration=33333333))
        p.get_by_name("in").end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        planes = [np.asarray(x)[0] for x in s.buffer.data]
        val = self._decode_region(planes)
        info = json.loads(val)
        assert info["BUFFERCOUNT"] == 0
        assert "TIMESTAMP" in info


class TestGdkPixbufSink:
    def test_posts_pixbuf_messages(self):
        p = parse_launch(
            "appsrc name=in ! video/x-raw, format=RGB, width=16, "
            "height=8, framerate=30/1 ! gdkpixbufsink name=s")
        frame = tuple(np.full((8, 16), v, np.uint8)[None]
                      for v in (1, 2, 3))
        p.get_by_name("in").push_buffer(Buffer(data=frame, batch=1))
        p.get_by_name("in").end_of_stream()
        p.run()
        s = p.get_by_name("s")
        assert s.last_pixbuf is not None
        assert s.last_pixbuf.shape == (8, 16, 3)
        msgs = [m for m in iter(lambda: p.bus.pop(), None)
                if m.type == "element"
                and m.data.get("name") == "pixbuf"]
        assert msgs and msgs[0].data["pixbuf"].shape == (8, 16, 3)


SVG = ("<svg width='64' height='48'>"
       "<rect x='4' y='4' width='20' height='10' fill='#ff0000'/>"
       "<circle cx='40' cy='24' r='8' fill='#00ff00'/>"
       "</svg>")


class TestRsvg:
    def test_rsvgdec(self):
        e = make("rsvgdec")
        out = e.host_process(Buffer(
            data=np.frombuffer(SVG.encode(), np.uint8), batch=1))
        rgba = np.stack([np.asarray(p)[0] for p in out.data], -1)
        assert rgba.shape == (48, 64, 4)
        assert (rgba[6:12, 6:20, 0] == 255).all()     # red rect
        assert (rgba[22:26, 38:42, 1] == 255).all()   # green circle
        assert rgba[0, 0, 3] == 0                     # transparent bg

    def test_rsvgoverlay(self):
        p = parse_launch(
            "appsrc name=in ! video/x-raw, format=RGB, width=64, "
            "height=48, framerate=30/1 ! rsvgoverlay name=o ! "
            "appsink name=out")
        p.get_by_name("o").props["data"] = SVG
        frame = tuple(np.zeros((48, 64), np.uint8)[None]
                      for _ in range(3))
        p.get_by_name("in").push_buffer(Buffer(data=frame, batch=1))
        p.get_by_name("in").end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        r = np.asarray(s.buffer.data[0])[0]
        assert (r[6:12, 6:20] > 200).all()
