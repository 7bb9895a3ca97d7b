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
    if fmt.bits == 16:
        d = fmt.depth[0]
        out = []
        for s in shapes:
            v = RNG.integers(0, 1 << d, size=s).astype(np.uint16)
            if fmt.name.startswith("P0"):    # left-justified containers
                v = (v << (16 - d)).astype(np.uint16)
            out.append(v)
        return tuple(out)
    return tuple(RNG.integers(0, 256, size=s, dtype=np.uint8) for s in shapes)


@pytest.mark.parametrize("name", sorted(FORMATS))
def test_bytes_roundtrip(name):
    fmt = format_info(name)
    w, h = 32, 16
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
