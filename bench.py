"""Headline benchmark: 1080p I420 -> RGB 224x224 convert+scale, frames/s/chip.

Reference pipeline (BASELINE.json configs[0]):
  gst-launch-1.0 videotestsrc ! videoconvert ! videoscale !
      video/x-raw,format=RGB,width=224,height=224 ! fakesink

Here the negotiated chain compiles to ONE fused XLA program (unpack ->
chroma up -> h/v scale -> bt709 matrix -> pack) over batched frames in HBM.
Target (BASELINE.md): >= 10 000 frames/s/chip.  Prints one JSON line.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gstreamer_tpu.video.converter import VideoConverter
    from gstreamer_tpu.video.info import VideoInfo

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")

    batch = 256
    ii = VideoInfo(format="I420", width=1920, height=1080)
    oi = VideoInfo(format="RGB", width=224, height=224)
    # videoscale's default method is bilinear/2-tap
    # (gstvideoconvertscale.c:1000-1005)
    conv = VideoConverter(ii, oi, {"resampler-method": "linear",
                                   "resampler-taps": 2})
    fn = jax.jit(conv.trace_fn())

    rng = np.random.default_rng(0)
    planes = tuple(
        jnp.asarray(rng.integers(0, 256, (batch,) + s, dtype=np.uint8))
        for s in ii.plane_shapes())

    # warmup / compile; fetch to host — on the tunneled backend
    # block_until_ready can return before async completion
    out = fn(planes)
    _ = np.asarray(out[0].ravel()[0:1])
    # second warmup pass settles the dispatch path
    for _ in range(4):
        out = fn(planes)
    _ = np.asarray(out[0].ravel()[0:1])

    # Steady-state throughput: enough iterations to amortize the fixed
    # ~35-40 ms tunnel round-trip of the final sync fetch (measured: the
    # marginal per-batch cost converges by ~48 iters).
    iters = 64
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(planes)
    # device executes in stream order: fetching one element of the last
    # output forces completion of every queued step without dragging the
    # whole frame over the management tunnel
    _ = np.asarray(out[0].ravel()[0:1])
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    target = 10000.0
    print(json.dumps({
        "metric": "1080p_i420_to_rgb224_convert_scale",
        "value": round(fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / target, 3),
    }))


if __name__ == "__main__":
    main()
