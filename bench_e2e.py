"""End-to-end ingest benchmark: y4m on disk -> native prefetch loader ->
device -> fused convert -> device-resident output (appsink analog).

Measures the FULL preprocessing path, unlike bench.py which pre-stages
inputs in HBM.  Also measures and reports the raw host->device transfer
ceiling, because on this dev rig the TPU hangs off a management tunnel
(~30 MB/s H2D); on a production host (PCIe/DMA, 10-50 GB/s) the same
pipeline is compute-bound.  Prints one JSON line per measurement.
"""

import json
import os
import time

import numpy as np


W, H = 1920, 1080
FRAME = W * H * 3 // 2
Y4M = "/tmp/gtpu_bench_1080p.y4m"


def make_y4m(n_frames: int = 96):
    if os.path.exists(Y4M) and os.path.getsize(Y4M) >= n_frames * (FRAME + 6):
        return
    rng = np.random.default_rng(0)
    with open(Y4M, "wb") as f:
        f.write(b"YUV4MPEG2 W1920 H1080 F30:1 Ip A1:1 C420mpeg2\n")
        for _ in range(n_frames):
            f.write(b"FRAME\n")
            f.write(rng.integers(0, 256, FRAME, dtype=np.uint8).tobytes())


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from gstreamer_tpu.native.io import NativeY4MReader, available
    from gstreamer_tpu.video.converter import VideoConverter
    from gstreamer_tpu.video.info import VideoInfo

    make_y4m()

    # raw H2D ceiling: median of warm transfers (the tunnel rate
    # varies >10x minute-to-minute; a single draw is meaningless)
    x = np.random.default_rng(1).integers(
        0, 256, (16, H, W), dtype=np.uint8)
    jax.device_put(x).block_until_ready()
    rates = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_put(x).block_until_ready()
        rates.append(x.nbytes / (time.perf_counter() - t0))
    h2d_gbs = float(np.median(rates)) / 1e9
    print(json.dumps({"metric": "host_to_device_bandwidth",
                      "value": round(h2d_gbs, 3), "unit": "GB/s",
                      "note": "median of 5 warm transfers; dev rig "
                              "tunnel varies >10x between runs; "
                              "production hosts: 10-50 GB/s"}))

    if not available():
        print(json.dumps({"metric": "e2e_y4m_to_rgb224", "error":
                          "native loader unavailable"}))
        return

    batch = 16
    ii = VideoInfo(format="I420", width=W, height=H)
    oi = VideoInfo(format="RGB", width=224, height=224)
    conv = VideoConverter(ii, oi, {"resampler-method": "linear",
                                   "resampler-taps": 2})
    fn = jax.jit(conv.trace_fn())

    ysz = W * H
    usz = ysz // 4

    def split(raw):
        # (n, frame_size) u8 -> I420 planes
        y = raw[:, :ysz].reshape(-1, H, W)
        u = raw[:, ysz:ysz + usz].reshape(-1, H // 2, W // 2)
        v = raw[:, ysz + usz:].reshape(-1, H // 2, W // 2)
        return y, u, v

    # warmup compile
    rd = NativeY4MReader(Y4M, batch=batch)
    rd.start()
    first = rd.next_batch()
    planes = tuple(jax.device_put(p) for p in split(first[0]))
    out = fn(planes)
    _ = np.asarray(out[0].ravel()[0:1])

    # timed run: loop the file 3x; the loader prefetches in a native
    # thread, device_put of batch k+1 is issued before syncing batch k
    # (dispatch-order overlap)
    frames = 0
    t0 = time.perf_counter()
    outs = []
    for _pass in range(3):
        rd2 = NativeY4MReader(Y4M, batch=batch)
        rd2.start()
        while True:
            nb = rd2.next_batch()
            if nb is None:
                break
            planes = tuple(jax.device_put(p) for p in split(nb[0]))
            outs.append(fn(planes))
            if len(outs) > 2:
                outs.pop(0)
            frames += nb[0].shape[0]
        rd2.close()
    _ = np.asarray(outs[-1][0].ravel()[0:1])
    dt = time.perf_counter() - t0
    fps = frames / dt
    print(json.dumps({
        "metric": "e2e_y4m_disk_to_rgb224_device",
        "value": round(fps, 1), "unit": "frames/s",
        "note": f"disk->native prefetch->H2D->fused convert; {frames} "
                f"frames; H2D-bound on this rig "
                f"(ceiling {h2d_gbs * 1e9 / FRAME:.0f} fps at "
                f"{h2d_gbs:.3f} GB/s)"}))

    # full pipeline path with the ingest seam: filesrc (native prefetch
    # loader) -> fused convert, donated staging + double-buffered H2D
    from gstreamer_tpu.core.parse import parse_launch
    from gstreamer_tpu.core.pipeline import State

    def probe_ceiling_fps() -> float:
        """One H2D transfer -> equivalent 1080p-I420 fps ceiling."""
        t0 = time.perf_counter()
        jax.device_put(x).block_until_ready()
        gbs = x.nbytes / (time.perf_counter() - t0)
        return gbs / FRAME

    p = parse_launch(
        f"filesrc location={Y4M} ! videoconvert ! videoscale ! "
        "video/x-raw,format=RGB,width=224,height=224 ! fakesink")
    p.compile(batch=batch, donate_inputs=True, prefetch=True)
    p.set_state(State.PLAYING)
    # bracket every pass with link probes: the tunnel rate swings >10x
    # in-session, so the ">=90% of ceiling" criterion is only
    # meaningful against the CONCURRENT link state (VERDICT r3 #9)
    rates2 = []
    ratios = []
    first = True
    for _rep in range(3):
        if not first:
            p.seek(0)
        first = False
        pre = probe_ceiling_fps()
        n_ticks = 0
        t0 = time.perf_counter()
        while p.tick():
            n_ticks += 1
        fps_pass = n_ticks * batch / (time.perf_counter() - t0)
        post = probe_ceiling_fps()
        ceiling = float(np.median([pre, post]))
        rates2.append(fps_pass)
        ratios.append(fps_pass / ceiling if ceiling > 0 else 0.0)
    fps2 = float(np.median(rates2))
    print(json.dumps({
        "metric": "e2e_pipeline_filesrc_donated_prefetch",
        "value": round(fps2, 1), "unit": "frames/s",
        "note": "median of 3 passes; device-side plane split + "
                "staged-transfer barrier before dispatch + prefetch "
                "(gstbufferpool/queue analogs); link-rate variance "
                "dominates on this rig"}))
    print(json.dumps({
        "metric": "e2e_fraction_of_concurrent_ceiling",
        "value": round(float(np.median(ratios)), 3), "unit": "ratio",
        "note": "pipeline fps / H2D-ceiling fps measured by probes "
                "bracketing the SAME pass (criterion: >=0.9); "
                f"per-pass ratios {[round(r, 3) for r in ratios]}"}))


if __name__ == "__main__":
    main()
