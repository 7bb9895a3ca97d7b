"""GstMeta registry analog + video metas: strided frame mapping
(GstVideoMeta, gstvideometa.c) and crop meta scale transforms."""

import numpy as np

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.meta import (VideoCropMeta, VideoMeta,
                                     frame_map_strided, register_meta,
                                     transform_metas)
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.core.pipeline import State
from gstreamer_tpu.video.format import format_info, from_bytes, to_bytes

RNG = np.random.default_rng(0)


def _strided_layout(fmt, w, h, pad):
    """Build a strided byte layout with `pad` extra bytes per row."""
    from gstreamer_tpu.video.format import plane_shapes
    bps = fmt.bits // 8
    planes = []
    strides, offsets = [], []
    chunks = []
    off = 0
    shapes = plane_shapes(fmt, w, h)
    for comp in fmt.plane_order:
        ph, pw = shapes[comp]
        raw = RNG.integers(0, 256 if fmt.bits == 8 else 1 << fmt.depth[0],
                           (ph, pw)).astype(
            np.uint8 if fmt.bits == 8 else np.uint16)
        planes.append((comp, raw))
        stride = pw * bps + pad
        rows = np.zeros((ph, stride), np.uint8)
        rb = raw if fmt.bits == 8 else np.ascontiguousarray(
            raw.astype(fmt.word_dtype)).view(np.uint8).reshape(ph, -1)
        rows[:, :pw * bps] = rb
        strides.append(stride)
        offsets.append(off)
        off += ph * stride
        chunks.append(rows.ravel())
    data = np.concatenate(chunks)
    comp_planes = [None] * len(shapes)
    for comp, raw in planes:
        comp_planes[comp] = raw
    return data, tuple(strides), tuple(offsets), tuple(comp_planes)


def test_frame_map_strided_planar():
    for name in ("I420", "Y444", "GBR", "I420_10LE"):
        fmt = format_info(name)
        data, strides, offsets, gold = _strided_layout(fmt, 32, 16, pad=7)
        meta = VideoMeta(name, 32, 16, strides, offsets)
        got = frame_map_strided(fmt, data, meta)
        for g, x in zip(gold, got):
            np.testing.assert_array_equal(g, x, err_msg=name)


def test_frame_map_strided_matches_tight():
    """pad=0 strided mapping == the tight from_bytes decoder."""
    fmt = format_info("NV12")
    w, h = 32, 16
    from gstreamer_tpu.video.format import frame_size, plane_shapes
    tight = RNG.integers(0, 256, frame_size(fmt, w, h), np.uint8)
    meta = VideoMeta("NV12", w, h, (w, w), (0, w * h))
    got = frame_map_strided(fmt, tight, meta)
    gold = from_bytes(fmt, tight, w, h)
    for g, x in zip(gold, got):
        np.testing.assert_array_equal(g, x)


def test_crop_meta_scales():
    buf = Buffer(data=None, meta={"video-crop": VideoCropMeta(10, 20, 40,
                                                              30)})
    out = transform_metas(buf, "scale", in_size=(100, 100),
                          out_size=(50, 200))
    c = out.meta["video-crop"]
    assert (c.x, c.y, c.width, c.height) == (5, 40, 20, 60)


def test_video_meta_dropped_on_scale():
    buf = Buffer(data=None, meta={
        "video": VideoMeta("I420", 64, 48, (64, 32, 32), (0, 0, 0)),
        "video-crop": VideoCropMeta(0, 0, 8, 8)})
    out = transform_metas(buf, "scale", in_size=(64, 48),
                          out_size=(32, 24))
    assert "video" not in out.meta          # strided layout invalidated
    assert "video-crop" in out.meta


def test_crop_meta_propagates_through_scale_element():
    p = parse_launch(
        "appsrc name=in caps=video/x-raw,format=I420,width=64,height=48,"
        "framerate=30/1 ! videoscale ! video/x-raw,width=32,height=24 ! "
        "appsink name=s")
    data = (RNG.integers(0, 256, (1, 48, 64), np.uint8),
            RNG.integers(0, 256, (1, 24, 32), np.uint8),
            RNG.integers(0, 256, (1, 24, 32), np.uint8))
    p.get_by_name("in").push_buffer(Buffer(
        data=data, pts=0, batch=1,
        meta={"video-crop": VideoCropMeta(8, 8, 32, 16)}))
    p.set_state(State.PLAYING)
    assert p.tick()
    s = p.get_by_name("s").pull_sample()
    c = s.buffer.meta["video-crop"]
    assert (c.x, c.y, c.width, c.height) == (4, 4, 16, 8)
