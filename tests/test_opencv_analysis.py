"""OpenCV-analog analysis elements: segmentation (scan-state GMM /
codebook), motioncells (grid motion + bus messages), templatematch,
cvtracker, grabcut, disparity — behavioral tests plus cv2-oracle
parity for the supporting kernels."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.ops import cv_kernels as cvk

cv2 = pytest.importorskip("cv2")

RNG = np.random.default_rng(99)


def run_frames(launch, frames, fmt="RGB", w=32, h=24):
    p = parse_launch(
        f"appsrc name=in ! video/x-raw, format={fmt}, width={w}, "
        f"height={h}, framerate=30/1 ! {launch} ! appsink name=out")
    src = p.get_by_name("in")
    fps_ns = 33333333
    for i, planes in enumerate(frames):
        src.push_buffer(Buffer(data=tuple(pl[None] for pl in planes),
                               batch=1, pts=i * fps_ns,
                               duration=fps_ns))
    src.end_of_stream()
    p.run()
    sink = p.get_by_name("out")
    outs = []
    while True:
        s = sink.pull_sample()
        if s is None:
            break
        outs.append([np.asarray(x)[0] for x in s.buffer.data])
    return p, outs


class TestSupportKernels:
    def test_pyr_down_bit_exact(self):
        for shape in ((48, 64), (47, 63)):
            g = RNG.integers(0, 256, shape, np.uint8)
            np.testing.assert_array_equal(cvk.pyr_down_u8(np, g),
                                          cv2.pyrDown(g))

    def test_adaptive_threshold_bit_exact(self):
        g = RNG.integers(0, 256, (48, 64), np.uint8)
        got = cvk.adaptive_threshold_gaussian_u8(np, g, 7, 5, inv=True)
        ref = cv2.adaptiveThreshold(g, 255,
                                    cv2.ADAPTIVE_THRESH_GAUSSIAN_C,
                                    cv2.THRESH_BINARY_INV, 7, 5)
        np.testing.assert_array_equal(got, ref)

    @pytest.mark.parametrize("method", range(6))
    def test_match_template_multi_vs_cv2(self, method):
        img = RNG.integers(0, 256, (48, 64, 3), np.uint8)
        t = img[12:24, 20:36].copy()
        ref = cv2.matchTemplate(img, t, method)
        got = cvk.match_template_multi(
            np, [img[..., c] for c in range(3)],
            [t[..., c] for c in range(3)], method)
        rel = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
        assert rel < 1e-4
        pick = np.argmin if method < 2 else np.argmax
        assert np.unravel_index(pick(got), got.shape) \
            == np.unravel_index(pick(ref), ref.shape)


def _rgba_frames(n_static, square_x, bgseed=0, h=24, w=32):
    bg = np.random.default_rng(bgseed).integers(0, 256, (h, w),
                                                np.uint8)
    alpha = np.full((h, w), 255, np.uint8)

    def frame(dx):
        r, g, b = bg.copy(), bg.copy(), bg.copy()
        if dx is not None:
            r[8:16, dx:dx + 8] = 255
            g[8:16, dx:dx + 8] = 0
            b[8:16, dx:dx + 8] = 0
        return (r, g, b, alpha)

    return [frame(None)] * n_static + [frame(square_x)]


class TestSegmentation:
    @pytest.mark.parametrize("method", ["mog2", "mog"])
    def test_gmm_learns_background_detects_object(self, method):
        frames = _rgba_frames(40, 10)
        _, outs = run_frames(f"segmentation method={method}", frames,
                             fmt="RGBA")
        mask = outs[-1][3]
        assert (mask[8:16, 10:18] == 255).all()
        rest = mask.copy()
        rest[8:16, 10:18] = 0
        assert (rest == 255).sum() == 0
        # RGB untouched when test-mode=false
        np.testing.assert_array_equal(outs[-1][0], frames[-1][0])

    def test_mog2_vs_cv2_iou(self):
        """Same synthetic sequence through cv2's MOG2: the masks must
        agree on the moving object (IoU of fg regions > 0.9)."""
        frames = _rgba_frames(40, 10)
        _, outs = run_frames(
            "segmentation method=mog2 learning-rate=0.01", frames,
            fmt="RGBA")
        sub = cv2.createBackgroundSubtractorMOG2()
        ref = None
        for (r, g, b, a) in frames:
            ref = sub.apply(np.stack([r, g, b], -1),
                            learningRate=0.01)
        got_fg = outs[-1][3] == 255
        ref_fg = ref == 255
        inter = (got_fg & ref_fg).sum()
        union = (got_fg | ref_fg).sum()
        assert union > 0 and inter / union > 0.9

    def test_test_mode_paints_rgb(self):
        frames = _rgba_frames(35, 12)
        _, outs = run_frames("segmentation test-mode=true", frames,
                             fmt="RGBA")
        mask = outs[-1][3]
        np.testing.assert_array_equal(outs[-1][0], mask)
        np.testing.assert_array_equal(outs[-1][1], mask)

    def test_codebook_method(self):
        frames = _rgba_frames(40, 12)
        _, outs = run_frames("segmentation method=codebook", frames,
                             fmt="RGBA")
        mask = outs[-1][3]
        # interior of the moving square foreground (morphological
        # open/close trims the 1px boundary)
        assert (mask[10:14, 14:18] == 255).all()
        rest = mask.copy()
        rest[8:16, 12:20] = 0
        assert (rest == 255).mean() < 0.02


class TestMotionCells:
    def _frames(self, n, move_at, h=48, w=64):
        bg = np.random.default_rng(3).integers(0, 256, (h, w),
                                               np.uint8)
        frames = []
        for i in range(n):
            r, g, b = bg.copy(), bg.copy(), bg.copy()
            if i >= move_at:
                dx = (i - move_at) * 4
                r[16:32, dx:dx + 16] = 255
                g[16:32, dx:dx + 16] = 255
                b[16:32, dx:dx + 16] = 0
            frames.append((r, g, b))
        return frames

    def test_motion_begin_message_and_cells(self):
        frames = self._frames(8, 3)
        p, outs = run_frames(
            "motioncells gridx=4 gridy=4 display=false", frames,
            w=64, h=48)
        msgs = [m for m in iter(lambda: p.bus.pop(), None)
                if m.type == "element"
                and m.data.get("name") == "motion"]
        begins = [m for m in msgs if "motion_begin" in m.data]
        assert begins, "no motion_begin posted"
        idx = begins[0].data["motion_cells_indices"]
        assert ":" in idx
        for tok in idx.split(","):
            r, c = tok.split(":")
            assert 0 <= int(r) < 4 and 0 <= int(c) < 4

    def test_display_draws_cells(self):
        frames = self._frames(6, 2)
        _, outs = run_frames(
            "motioncells gridx=4 gridy=4 display=true "
            "cellscolor=255,0,0", frames, w=64, h=48)
        # some pixel in the last output is pure red (drawn border)
        r, g, b = outs[-1][:3]
        drawn = (r == 255) & (g == 0) & (b == 0)
        assert drawn.any()

    def test_postallmotion_and_finished(self):
        frames = self._frames(6, 2) + self._frames(1, 99) * 8
        p, _ = run_frames(
            "motioncells gridx=4 gridy=4 postallmotion=true gap=0 "
            "display=false", frames, w=64, h=48)
        kinds = set()
        for m in iter(lambda: p.bus.pop(), None):
            if m.type == "element" and m.data.get("name") == "motion":
                kinds.update(m.data.keys())
        assert "motion_begin" in kinds
        assert "motion" in kinds or "motion_finished" in kinds


class TestTemplateMatch:
    def test_finds_template_and_posts(self, tmp_path):
        img = RNG.integers(0, 256, (48, 64, 3), np.uint8)
        templ = img[20:32, 30:46]
        from PIL import Image

        tpath = tmp_path / "templ.png"
        Image.fromarray(templ).save(tpath)
        frames = [tuple(img[..., c] for c in range(3))]
        p, outs = run_frames(
            f"templatematch template={tpath} display=false", frames,
            fmt="BGR", w=64, h=48)
        msgs = [m for m in iter(lambda: p.bus.pop(), None)
                if m.type == "element"
                and m.data.get("name") == "template_match"]
        assert msgs
        f = msgs[-1].data
        assert (f["x"], f["y"]) == (30, 20)
        assert (f["width"], f["height"]) == (16, 12)

    def test_display_draws_box(self, tmp_path):
        img = RNG.integers(0, 256, (48, 64, 3), np.uint8)
        from PIL import Image

        tpath = tmp_path / "t.png"
        Image.fromarray(img[10:20, 10:22]).save(tpath)
        frames = [tuple(img[..., c] for c in range(3))]
        _, outs = run_frames(f"templatematch template={tpath}",
                             frames, fmt="BGR", w=64, h=48)
        assert (outs[0][0] != img[..., 0]).any()


class TestCvTracker:
    def test_tracks_moving_square(self):
        h, w = 48, 64
        patch = RNG.integers(80, 256, (16, 16), np.uint8)
        frames = []
        for i in range(6):
            r = np.zeros((h, w), np.uint8)
            g = np.zeros((h, w), np.uint8)
            b = np.zeros((h, w), np.uint8)
            x = 10 + i * 3
            r[12:28, x:x + 16] = patch
            g[12:28, x:x + 16] = patch // 2
            frames.append((r, g, b))
        p, _ = run_frames(
            "cvtracker object-initial-x=10 object-initial-y=12 "
            "object-initial-width=16 object-initial-height=16 "
            "draw-rect=false", frames, w=w, h=h)
        msgs = [m for m in iter(lambda: p.bus.pop(), None)
                if m.type == "element"
                and m.data.get("name") == "object"]
        assert len(msgs) == 6
        xs = [m.data["x"] for m in msgs]
        assert xs[0] == 10
        assert xs[-1] == 10 + 5 * 3          # followed the motion
        assert all(m.data["width"] == 16 for m in msgs)


class TestGrabCut:
    def test_alpha_seeded_foreground(self):
        h, w = 32, 40
        # object: bright red blob on dark background
        r = np.full((h, w), 20, np.uint8)
        g = np.full((h, w), 25, np.uint8)
        b = np.full((h, w), 30, np.uint8)
        r[8:24, 12:28] = 220
        g[8:24, 12:28] = 40
        # seed alpha: PR_FGD box roughly over the object
        a = np.zeros((h, w), np.uint8)
        a[6:26, 10:30] = 3
        _, outs = run_frames("grabcut", [(r, g, b, a)], fmt="RGBA",
                             w=w, h=h)
        mask = outs[0][3]
        assert (mask[10:22, 14:26] == 255).mean() > 0.9
        border = mask.copy()
        border[6:26, 10:30] = 0
        assert (border == 255).mean() < 0.05

    def test_no_seed_skips_frame(self):
        h, w = 16, 16
        planes = tuple(np.full((h, w), v, np.uint8)
                       for v in (10, 20, 30, 255))
        _, outs = run_frames("grabcut", [planes], fmt="RGBA", w=w, h=h)
        np.testing.assert_array_equal(outs[0][3], planes[3])


class TestDisparity:
    def _stereo_pair(self, shift, h=48, w=64):
        base = np.random.default_rng(11).integers(
            0, 256, (h, w + 16), np.uint8)
        # standard rectified convention: x_right = x_left - d, so the
        # right view samples the scene `shift` pixels to the right
        left = base[:, :w]
        right = base[:, shift:shift + w]
        return left, right

    @pytest.mark.parametrize("method", ["sbm", "sgbm"])
    def test_uniform_shift_recovered(self, method):
        shift = 6
        left, right = self._stereo_pair(shift)
        h, w = left.shape
        p = parse_launch(
            f"disparity name=d method={method} ! appsink name=out "
            f"appsrc name=l ! video/x-raw, format=RGB, width={w}, "
            f"height={h}, framerate=30/1 ! d.sink_left "
            f"appsrc name=r ! video/x-raw, format=RGB, width={w}, "
            f"height={h}, framerate=30/1 ! d.sink_right")
        p.get_by_name("l").push_buffer(Buffer(
            data=(left[None], left[None], left[None]), batch=1))
        p.get_by_name("r").push_buffer(Buffer(
            data=(right[None], right[None], right[None]), batch=1))
        p.get_by_name("l").end_of_stream()
        p.get_by_name("r").end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        disp = np.asarray(s.buffer.data[0])[0]
        # recovered disparity (scaled by 255/31) in the interior
        expected = round(shift * 255.0 / 31)
        interior = disp[8:-8, 16:-8]
        frac = (np.abs(interior.astype(int) - expected) <= 8).mean()
        assert frac > 0.85
