"""Video format pack/unpack tests (modeled on the reference
gst-plugins-base/tests/check/libs/video.c pack/unpack roundtrips)."""

import numpy as np
import pytest

from gstreamer_tpu.video.format import (
    FORMATS, format_info, frame_size, from_bytes, pack, plane_shapes,
    to_bytes, unpack)

RNG = np.random.default_rng(42)


def random_planes(fmt, width, height):
    shapes = plane_shapes(fmt, width, height)
    out = []
    for c, s in enumerate(shapes):
        d = fmt.depth[c] if c < len(fmt.depth) else fmt.depth[0]
        if fmt.bits == 16:
            v = RNG.integers(0, 1 << d, size=s).astype(np.uint16)
            if fmt.justify == "high":    # left-justified containers
                v = (v << (16 - d)).astype(np.uint16)
        else:
            v = RNG.integers(0, 1 << min(d, 8), size=s).astype(np.uint8)
        out.append(v)
    return tuple(out)


@pytest.mark.parametrize("name", sorted(FORMATS))
def test_bytes_roundtrip(name):
    fmt = format_info(name)
    w, h = 32, 16
    if name == "RGB8P":
        # palette pack is quantizing (video-format.c:2255 "poor man's
        # palette"); roundtrip is only stable through index space
        data = RNG.integers(0, 256, size=frame_size(fmt, w, h)).astype(
            np.uint8)
        planes = from_bytes(fmt, data, w, h)
        again = from_bytes(fmt, to_bytes(fmt, planes, w, h).reshape(-1),
                           w, h)
        idx = to_bytes(fmt, planes, w, h)[..., :h * w]
        np.testing.assert_array_equal(
            to_bytes(fmt, again, w, h)[..., :h * w], idx)
        return
    planes = random_planes(fmt, w, h)
    data = to_bytes(fmt, planes, w, h)
    assert data.shape[-1] == frame_size(fmt, w, h) or fmt.layout == "packed"
    back = from_bytes(fmt, data.reshape(-1), w, h)
    for p, b in zip(planes, back):
        np.testing.assert_array_equal(p, b)


@pytest.mark.parametrize("name", sorted(FORMATS))
def test_unpack_pack_identity(name):
    """pack(unpack(x)) must reproduce x exactly: unpack duplicates chroma
    (nearest), pack selects the top-left sample of each chroma block."""
    fmt = format_info(name)
    w, h = 32, 16
    planes = random_planes(fmt, w, h)
    canon = unpack(np, fmt, planes, w, h)
    assert canon.shape == (h, w, 4)
    back = pack(np, fmt, canon, w, h)
    for p, b in zip(planes, back):
        np.testing.assert_array_equal(p, b)


def test_unpack_i420_semantics():
    """Chroma must be nearest-duplicated (ORC loadupdb + GET_UV_420 y>>1)."""
    fmt = format_info("I420")
    y = np.arange(16, dtype=np.uint8).reshape(4, 4)
    u = np.array([[1, 2], [3, 4]], np.uint8)
    v = np.array([[5, 6], [7, 8]], np.uint8)
    canon = unpack(np, fmt, (y, u, v), 4, 4)
    np.testing.assert_array_equal(canon[..., 0], 255)          # alpha
    np.testing.assert_array_equal(canon[..., 1], y)
    np.testing.assert_array_equal(
        canon[..., 2],
        [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]])
    np.testing.assert_array_equal(canon[0, :, 3], [5, 5, 6, 6])


def test_odd_sizes():
    for name in ("I420", "YUY2", "NV12", "Y41B"):
        fmt = format_info(name)
        w, h = 31, 15 if name not in ("I420", "NV12") else 16
        planes = random_planes(fmt, w, h)
        canon = unpack(np, fmt, planes, w, h)
        assert canon.shape == (h, w, 4)
        back = pack(np, fmt, canon, w, h)
        for p, b in zip(planes, back):
            assert p.shape == b.shape


def test_jax_matches_numpy_unpack():
    import jax.numpy as jnp
    for name in ("I420", "NV12", "YUY2", "RGB", "BGRA", "AYUV", "GRAY8"):
        fmt = format_info(name)
        w, h = 16, 8
        planes = random_planes(fmt, w, h)
        gold = unpack(np, fmt, planes, w, h)
        got = np.asarray(unpack(jnp, fmt, tuple(jnp.asarray(p) for p in planes), w, h))
        np.testing.assert_array_equal(gold, got)


class TestV210:
    """v210: 10-bit 4:2:2, 6 px / 16 bytes (video-format.c:559,651)."""

    def test_roundtrip(self):
        from gstreamer_tpu.video.format import (format_info, from_bytes,
                                                frame_size, to_bytes)
        f = format_info("v210")
        rng = np.random.RandomState(0)
        for w, h in ((48, 4), (20, 3), (6, 2), (7, 2)):
            y = rng.randint(0, 1024, (h, w)).astype(np.uint16)
            u = rng.randint(0, 1024, (h, (w + 1) // 2)).astype(np.uint16)
            v = rng.randint(0, 1024, (h, (w + 1) // 2)).astype(np.uint16)
            b = to_bytes(f, [y, u, v], w, h)
            assert b.size == frame_size(f, w, h) == h * ((w + 47) // 48) * 128
            y2, u2, v2 = from_bytes(f, b, w, h)
            assert np.array_equal(y, y2) and np.array_equal(u, u2) \
                and np.array_equal(v, v2), (w, h)

    def test_known_word_layout(self):
        from gstreamer_tpu.video.format import format_info, to_bytes
        f = format_info("v210")
        y = np.arange(1, 7, dtype=np.uint16).reshape(1, 6)
        u = np.array([[0x10, 0x20, 0x30]], np.uint16)
        v = np.array([[0x40, 0x50, 0x60]], np.uint16)
        b = to_bytes(f, [y, u, v], 6, 1)
        w = np.frombuffer(b.tobytes()[:16], "<u4")
        assert w[0] == 0x10 | (1 << 10) | (0x40 << 20)
        assert w[1] == 2 | (0x20 << 10) | (3 << 20)
        assert w[2] == 0x50 | (4 << 10) | (0x30 << 20)
        assert w[3] == 5 | (0x60 << 10) | (6 << 20)
