"""Extended benchmark suite — one JSON line per BASELINE.json config.

`bench.py` remains the single-line headline benchmark (config 0); this
script additionally measures the audioresample, compositor and
deinterlace-chain configs on whatever jax.devices() provides.
"""

import json
import time

import numpy as np


def _sync(out):
    import numpy as _np
    leaves = out if isinstance(out, (tuple, list)) else (out,)
    _ = _np.asarray(leaves[0].ravel()[0:1])


def bench_convert(jax, jnp):
    from gstreamer_tpu.video.converter import VideoConverter
    from gstreamer_tpu.video.info import VideoInfo

    batch = 256
    ii = VideoInfo(format="I420", width=1920, height=1080)
    oi = VideoInfo(format="RGB", width=224, height=224)
    conv = VideoConverter(ii, oi, {"resampler-method": "linear",
                                   "resampler-taps": 2})
    fn = jax.jit(conv.trace_fn())
    rng = np.random.default_rng(0)
    planes = tuple(jax.device_put(
        rng.integers(0, 256, (batch,) + s, dtype=np.uint8))
        for s in ii.plane_shapes())
    out = fn(planes)
    _sync(out)
    # enough iterations to amortize the fixed ~40ms tunnel sync
    iters = 48
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(planes)
    _sync(out)
    fps = batch * iters / (time.perf_counter() - t0)
    return {"metric": "1080p_i420_to_rgb224_convert_scale",
            "value": round(fps, 1), "unit": "frames/s/chip"}


def bench_audioresample(jax, jnp):
    from gstreamer_tpu.audio.channel_mixer import build_matrix
    from gstreamer_tpu.audio.resampler import AudioResampler

    res = AudioResampler("kaiser", 48000, 16000)
    n = 1 << 17                       # ~2.7 s of 48 kHz stereo per chunk
    bsz = 128                         # chunks batched via vmap
    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32767, (bsz, n, 2), dtype=np.int16)
    rf = res.resample_fn("f32", n, 2)
    fn = jax.jit(jax.vmap(lambda s: rf(s.astype(jnp.float32) / 32768.0
                                       ).mean(axis=-1)))
    X = jax.device_put(x)
    out = fn(X)
    _sync(out)
    iters = 40
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(X)
    _sync(out)
    msps = bsz * n * iters / (time.perf_counter() - t0) / 1e6
    return {"metric": "audioresample_48k_stereo_s16_to_16k_mono",
            "value": round(msps, 2), "unit": "Msamples/s"}




def _drain(pipe):
    """Fetch one byte of the sink's last device buffer: the tunnel's
    block_until_ready is unreliable, and without a fetch these loops
    time dispatch rate, not throughput."""
    import numpy as _np
    for e in pipe.iterate_elements() if hasattr(pipe, "iterate_elements") \
            else pipe.elements:
        buf = getattr(e, "last_buffer", None)
        if buf is not None and buf.data is not None:
            leaves = buf.data if isinstance(buf.data, (tuple, list)) \
                else [buf.data]
            leaf = leaves[0]
            if hasattr(leaf, "ravel") and not isinstance(leaf, _np.ndarray):
                _np.asarray(leaf.ravel()[0:1])   # 1-byte device fetch
            return

def bench_compositor(jax, jnp):
    from gstreamer_tpu.core.buffer import Buffer
    from gstreamer_tpu.core.parse import parse_launch

    batch = 32
    desc = ("compositor name=c "
            "sink_1::xpos=1920 sink_2::ypos=1080 "
            "sink_3::xpos=1920 sink_3::ypos=1080 ! "
            "video/x-raw,width=3840,height=2160 ! fakesink "
            + " ".join(
                f"appsrc name=in{k} caps=video/x-raw,format=I420,"
                f"width=1920,height=1080,framerate=30/1 ! c.sink_{k}"
                for k in range(4)))
    pipe = parse_launch(desc)
    rng = np.random.default_rng(0)
    y = jax.device_put(rng.integers(0, 256, (batch, 1080, 1920),
                                    dtype=np.uint8))
    u = jax.device_put(rng.integers(0, 256, (batch, 540, 960),
                                    dtype=np.uint8))
    v = jax.device_put(rng.integers(0, 256, (batch, 540, 960),
                                    dtype=np.uint8))

    def push_all():
        for k in range(4):
            pipe.get_by_name(f"in{k}").push_buffer(
                Buffer(data=(y, u, v), pts=0, duration=33333333,
                       batch=batch))

    from gstreamer_tpu.core.pipeline import State
    push_all()
    pipe.set_state(State.PLAYING)
    pipe.tick()
    _drain(pipe)
    iters = 32
    t0 = time.perf_counter()
    for _ in range(iters):
        push_all()
        pipe.tick()
    _drain(pipe)
    dt = time.perf_counter() - t0
    fps = batch * iters / dt
    return {"metric": "compositor_4x1080p_to_4k_mosaic",
            "value": round(fps, 1), "unit": "frames/s/chip"}


def bench_deinterlace_chain(jax, jnp):
    from gstreamer_tpu.core.buffer import Buffer
    from gstreamer_tpu.core.parse import parse_launch

    batch = 64
    pipe = parse_launch(
        "appsrc name=in caps=video/x-raw,format=I420,width=1920,"
        "height=1080,framerate=30/1 ! deinterlace method=linear ! "
        "videobalance contrast=1.1 brightness=0.05 ! fakesink")
    rng = np.random.default_rng(0)
    y = jax.device_put(rng.integers(0, 256, (batch, 1080, 1920),
                                    dtype=np.uint8))
    u = jax.device_put(rng.integers(0, 256, (batch, 540, 960),
                                    dtype=np.uint8))
    v = jax.device_put(rng.integers(0, 256, (batch, 540, 960),
                                    dtype=np.uint8))

    def push():
        pipe.get_by_name("in").push_buffer(
            Buffer(data=(y, u, v), pts=0, duration=33333333, batch=batch))

    from gstreamer_tpu.core.pipeline import State
    # two warmup ticks: the first tick's output batch is 2B-1 (field
    # history fill), steady state is 2B — both shapes must be compiled
    # before timing
    push()
    pipe.set_state(State.PLAYING)
    pipe.tick()
    push()
    pipe.tick()
    _drain(pipe)
    iters = 24
    t0 = time.perf_counter()
    for _ in range(iters):
        push()
        pipe.tick()
    _drain(pipe)
    fps = batch * iters / (time.perf_counter() - t0)
    return {"metric": "deinterlace_videobalance_1080i_chain",
            "value": round(fps, 1), "unit": "frames/s/chip"}


def bench_effectv(jax, jnp):
    """edgetv+vertigotv chain: frame-feedback effects running as
    lax.scan INSIDE the fused device program (state carried in HBM)."""
    from gstreamer_tpu.core.buffer import Buffer
    from gstreamer_tpu.core.parse import parse_launch
    from gstreamer_tpu.core.pipeline import State

    batch = 128
    pipe = parse_launch(
        "appsrc name=in caps=video/x-raw,format=RGB,width=640,height=480,"
        "framerate=30/1 ! edgetv ! vertigotv ! fakesink")
    rng = np.random.default_rng(0)
    planes = tuple(jax.device_put(
        rng.integers(0, 256, (batch, 480, 640), np.uint8))
        for _ in range(3))

    def push():
        pipe.get_by_name("in").push_buffer(
            Buffer(data=planes, pts=0, duration=33333333, batch=batch))

    push()
    pipe.set_state(State.PLAYING)
    pipe.tick()
    _drain(pipe)
    iters = 24
    t0 = time.perf_counter()
    for _ in range(iters):
        push()
        pipe.tick()
    _drain(pipe)
    fps = batch * iters / (time.perf_counter() - t0)
    return {"metric": "effectv_edge_vertigo_480p_device_scan",
            "value": round(fps, 1), "unit": "frames/s/chip"}


def bench_convert_dp(jax, jnp):
    """Data-parallel headline: batch sharded over ALL devices (dp mesh).
    On the 1-chip dev rig this equals bench_convert; on a pod slice it
    scales with the dp axis."""
    from gstreamer_tpu.parallel.sharding import make_mesh, \
        shard_batched_pytree
    from gstreamer_tpu.video.converter import VideoConverter
    from gstreamer_tpu.video.info import VideoInfo

    n = len(jax.devices())
    mesh = make_mesh(n, axis_names=("dp",))
    batch = 256 * n
    ii = VideoInfo(format="I420", width=1920, height=1080)
    oi = VideoInfo(format="RGB", width=224, height=224)
    conv = VideoConverter(ii, oi, {"resampler-method": "linear",
                                   "resampler-taps": 2})
    fn = jax.jit(conv.trace_fn())
    rng = np.random.default_rng(0)
    planes = shard_batched_pytree(mesh, tuple(
        rng.integers(0, 256, (batch,) + s, dtype=np.uint8)
        for s in ii.plane_shapes()))
    out = fn(planes)
    _sync(out)
    iters = 48
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(planes)
    _sync(out)
    fps = batch * iters / (time.perf_counter() - t0)
    return {"metric": "1080p_convert_scale_dp_all_devices",
            "value": round(fps, 1), "unit": f"frames/s ({n} devices)"}


def main():
    import sys

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    benches = [bench_convert, bench_audioresample, bench_compositor,
               bench_deinterlace_chain, bench_effectv]
    if "--dp" in sys.argv:
        benches.append(bench_convert_dp)
    for fn in benches:
        try:
            print(json.dumps(fn(jax, jnp)), flush=True)
        except Exception as e:     # pragma: no cover
            print(json.dumps({"metric": fn.__name__, "error": str(e)}),
                  flush=True)


if __name__ == "__main__":
    main()
