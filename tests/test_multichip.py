"""Pipeline-level multichip: Pipeline.compile(mesh=...) shards the batch
over the mesh's dp axis via shard_map (SURVEY §2.8) — verified bit-equal
to single-device execution on the 8-virtual-device CPU mesh for
videoconvert+videoscale, compositor, and audioresample.
"""

import numpy as np
import pytest

import jax

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.core.pipeline import State
from gstreamer_tpu.parallel.sharding import make_mesh


def _mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8, axis_names=("dp",))


def _run_convert(mesh, batch=8):
    p = parse_launch(
        "appsrc name=in caps=video/x-raw,format=I420,width=64,height=48,"
        "framerate=30/1 ! videoconvert ! videoscale ! "
        "video/x-raw,format=RGB,width=32,height=32 ! appsink name=s")
    rng = np.random.default_rng(5)
    data = (rng.integers(0, 256, (batch, 48, 64), np.uint8),
            rng.integers(0, 256, (batch, 24, 32), np.uint8),
            rng.integers(0, 256, (batch, 24, 32), np.uint8))
    p.get_by_name("in").push_buffer(Buffer(data=data, pts=0, batch=batch))
    p.compile(batch=batch, mesh=mesh)
    p.set_state(State.PLAYING)
    assert p.tick()
    s = p.get_by_name("s").pull_sample()
    return tuple(np.asarray(x) for x in s.buffer.data)


def test_convert_scale_sharded_bit_equal():
    gold = _run_convert(None)
    sharded = _run_convert(_mesh8())
    for g, x in zip(gold, sharded):
        np.testing.assert_array_equal(g, x)


def _run_compositor(mesh, batch=8):
    desc = ("compositor name=c sink_1::xpos=64 sink_1::alpha=0.5 ! "
            "video/x-raw,width=128,height=48 ! appsink name=s "
            + " ".join(
                f"appsrc name=in{k} caps=video/x-raw,format=I420,"
                f"width=64,height=48,framerate=30/1 ! c.sink_{k}"
                for k in range(2)))
    p = parse_launch(desc)
    rng = np.random.default_rng(6)
    for k in range(2):
        data = (rng.integers(0, 256, (batch, 48, 64), np.uint8),
                rng.integers(0, 256, (batch, 24, 32), np.uint8),
                rng.integers(0, 256, (batch, 24, 32), np.uint8))
        p.get_by_name(f"in{k}").push_buffer(
            Buffer(data=data, pts=0, batch=batch))
    p.compile(batch=batch, mesh=mesh)
    p.set_state(State.PLAYING)
    assert p.tick()
    s = p.get_by_name("s").pull_sample()
    return tuple(np.asarray(x) for x in s.buffer.data)


def test_compositor_sharded_bit_equal():
    gold = _run_compositor(None)
    sharded = _run_compositor(_mesh8())
    for g, x in zip(gold, sharded):
        np.testing.assert_array_equal(g, x)


def _run_audio(mesh, batch=8):
    p = parse_launch(
        "appsrc name=in caps=audio/x-raw,format=S16LE,rate=48000,"
        "channels=2,layout=interleaved ! audioconvert ! audioresample ! "
        "audio/x-raw,format=F32LE,rate=16000,channels=1 ! appsink name=s")
    rng = np.random.default_rng(7)
    # audio data = (samples, channels); the dp axis shards the sample
    # axis — exact for the pointwise audioconvert chain (the stateful
    # audioresample stays a host element either way)
    data = rng.integers(-32768, 32767, (4800 * batch, 2), np.int16)
    p.get_by_name("in").push_buffer(Buffer(data=data, pts=0, batch=batch))
    p.compile(batch=batch, mesh=mesh)
    p.set_state(State.PLAYING)
    assert p.tick()
    s = p.get_by_name("s").pull_sample()
    return tuple(np.asarray(x) for x in s.buffer.data)


def test_audioresample_sharded_bit_equal():
    gold = _run_audio(None)
    sharded = _run_audio(_mesh8())
    for g, x in zip(gold, sharded):
        np.testing.assert_array_equal(g, x)


def test_sharded_output_spans_mesh():
    mesh = _mesh8()
    p = parse_launch(
        "videotestsrc num-buffers=8 ! video/x-raw,format=I420,width=64,"
        "height=48,framerate=30/1 ! videoconvert ! "
        "video/x-raw,format=RGB ! appsink name=s")
    p.compile(batch=8, mesh=mesh)
    p.set_state(State.PLAYING)
    assert p.tick()
    s = p.get_by_name("s").pull_sample()
    leaf = s.buffer.data[0]
    assert len(leaf.sharding.device_set) == 8


def test_batch_not_divisible_raises():
    mesh = _mesh8()
    p = parse_launch("videotestsrc num-buffers=6 ! fakesink")
    with pytest.raises(ValueError):
        p.compile(batch=6, mesh=mesh)


def _mesh_2d(dp, sp):
    if len(jax.devices()) < dp * sp:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(dp * sp, axis_names=("dp", "sp"), shape=(dp, sp))


class TestSpatialSharding:
    """dp x sp meshes: frame ROWS shard over the sp axis (the
    sequence-parallel analog for >VMEM frames, SURVEY §2.8/§5); XLA
    inserts the halo exchanges for the vertical scaler taps from the
    GSPMD sharding annotations.  Results must stay bit-equal."""

    @pytest.mark.parametrize("dp,sp", [(2, 4), (4, 2), (1, 8)])
    def test_convert_scale_rows_sharded_bit_equal(self, dp, sp):
        gold = _run_convert(None, batch=8)
        sharded = _run_convert(_mesh_2d(dp, sp), batch=8)
        for g, x in zip(gold, sharded):
            np.testing.assert_array_equal(g, x)

    def test_tall_frame_rows_sharded(self):
        # a tall frame whose vertical 4-tap scaling spans shard
        # boundaries many times
        mesh = _mesh_2d(1, 8)
        p = parse_launch(
            "appsrc name=in caps=video/x-raw,format=I420,width=32,"
            "height=512,framerate=30/1 ! videoconvert ! videoscale ! "
            "video/x-raw,format=RGB,width=32,height=100 ! appsink name=s")
        rng = np.random.default_rng(9)
        batch = 2
        data = (rng.integers(0, 256, (batch, 512, 32), np.uint8),
                rng.integers(0, 256, (batch, 256, 16), np.uint8),
                rng.integers(0, 256, (batch, 256, 16), np.uint8))
        p.get_by_name("in").push_buffer(
            Buffer(data=data, pts=0, batch=batch))
        p.compile(batch=batch, mesh=mesh)
        p.set_state(State.PLAYING)
        assert p.tick()
        sharded = tuple(np.asarray(x) for x in
                        p.get_by_name("s").pull_sample().buffer.data)

        p2 = parse_launch(
            "appsrc name=in caps=video/x-raw,format=I420,width=32,"
            "height=512,framerate=30/1 ! videoconvert ! videoscale ! "
            "video/x-raw,format=RGB,width=32,height=100 ! appsink name=s")
        p2.get_by_name("in").push_buffer(
            Buffer(data=data, pts=0, batch=batch))
        p2.compile(batch=batch)
        p2.set_state(State.PLAYING)
        assert p2.tick()
        gold = tuple(np.asarray(x) for x in
                     p2.get_by_name("s").pull_sample().buffer.data)
        for g, x in zip(gold, sharded):
            np.testing.assert_array_equal(g, x)
