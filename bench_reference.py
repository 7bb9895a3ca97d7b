"""Measure the REFERENCE GStreamer CPU throughput on this host.

Drives the real installed libgstvideo/libgstaudio (same binaries the
parity oracle uses — tests/gst_ref.py) through their public C APIs with
ctypes, for the BASELINE.json configs that are reachable without
gst-launch (not installed on this image):

  config0  1080p I420 -> RGB 224x224 convert+scale  (gst_video_converter_frame)
  config1  48 kHz stereo S16 -> 16 kHz mono F32     (gst_audio_converter_samples)
  config2  compositor 4x1080p -> 4K                 (PROXY: 4x gst_video_blend;
           the compositor's ORC blend lives inside the plugin .so and is not
           exported — video-blend.c is the nearest public blend path)
  config3  deinterlace chain: NOT measurable via public API (tvtime methods
           are plugin-internal, gst-plugins-good/gst/deinterlace/tvtime/)

Prints one JSON line per config.  Run on the host CPU (nproc=1 here).
"""

import ctypes
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo/tests")
import gst_ref  # noqa: E402


def bench_convert():
    in_caps = "video/x-raw,format=I420,width=1920,height=1080"
    out_caps = "video/x-raw,format=RGB,width=224,height=224"
    libs = gst_ref._load()
    gst, video = libs["gst"], libs["video"]
    in_info = gst_ref._video_info(in_caps)
    out_info = gst_ref._video_info(out_caps)
    in_size, in_offsets, in_strides = gst_ref._info_geometry(in_info)
    out_size, _, _ = gst_ref._info_geometry(out_info)

    conv = video.gst_video_converter_new(in_info, out_info, None)
    assert conv

    rng = np.random.default_rng(0)
    src_mem = gst.g_malloc(in_size)
    frame = rng.integers(0, 256, in_size, dtype=np.uint8)
    ctypes.memmove(src_mem, frame.ctypes.data, in_size)
    src_buf = gst.gst_buffer_new_wrapped(src_mem, in_size)
    dst_mem = gst.g_malloc(out_size)
    dst_buf = gst.gst_buffer_new_wrapped(dst_mem, out_size)

    sf = ctypes.create_string_buffer(gst_ref.VIDEO_FRAME_SIZE)
    df = ctypes.create_string_buffer(gst_ref.VIDEO_FRAME_SIZE)
    assert video.gst_video_frame_map(sf, in_info, src_buf, gst_ref.GST_MAP_READ)
    assert video.gst_video_frame_map(df, out_info, dst_buf,
                                     gst_ref.GST_MAP_WRITE)
    # warmup
    for _ in range(3):
        video.gst_video_converter_frame(conv, sf, df)
    iters = 100
    t0 = time.perf_counter()
    for _ in range(iters):
        video.gst_video_converter_frame(conv, sf, df)
    dt = time.perf_counter() - t0
    return {"metric": "ref_1080p_i420_to_rgb224_convert_scale",
            "value": round(iters / dt, 1), "unit": "frames/s",
            "note": "gst_video_converter_frame, default config (fastpath "
                    "eligible), single thread, host CPU"}


def bench_audio():
    libs = gst_ref._load()
    gst = libs["gst"]
    # RTLD_LOCAL: libgstreamer's dep tree includes libunwind, whose
    # _Unwind_* symbols must not shadow libgcc's (see tests/gst_ref.py)
    audio = ctypes.CDLL("libgstaudio-1.0.so.0")
    audio.gst_audio_info_from_caps.restype = ctypes.c_bool
    audio.gst_audio_info_from_caps.argtypes = [ctypes.c_void_p,
                                               ctypes.c_void_p]
    audio.gst_audio_converter_new.restype = ctypes.c_void_p
    audio.gst_audio_converter_new.argtypes = [ctypes.c_int, ctypes.c_void_p,
                                              ctypes.c_void_p,
                                              ctypes.c_void_p]
    audio.gst_audio_converter_samples.restype = ctypes.c_bool
    audio.gst_audio_converter_samples.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_void_p, ctypes.c_size_t]
    audio.gst_audio_converter_get_out_frames.restype = ctypes.c_size_t
    audio.gst_audio_converter_get_out_frames.argtypes = [ctypes.c_void_p,
                                                         ctypes.c_size_t]

    def ainfo(caps_str):
        caps = gst.gst_caps_from_string(caps_str.encode())
        info = ctypes.create_string_buffer(512)
        assert audio.gst_audio_info_from_caps(info, caps)
        return info

    in_info = ainfo("audio/x-raw,format=S16LE,rate=48000,channels=2,"
                    "layout=interleaved")
    out_info = ainfo("audio/x-raw,format=F32LE,rate=16000,channels=1,"
                     "layout=interleaved")
    conv = audio.gst_audio_converter_new(0, in_info, out_info, None)
    assert conv

    n = 1 << 17
    rng = np.random.default_rng(0)
    inbuf = np.ascontiguousarray(
        rng.integers(-32768, 32767, (n, 2), dtype=np.int16))
    out_frames = audio.gst_audio_converter_get_out_frames(conv, n)
    outbuf = np.zeros((out_frames, 1), np.float32)
    in_ptrs = (ctypes.c_void_p * 1)(inbuf.ctypes.data)
    out_ptrs = (ctypes.c_void_p * 1)(outbuf.ctypes.data)

    for _ in range(3):
        assert audio.gst_audio_converter_samples(conv, 0, in_ptrs, n,
                                                 out_ptrs, out_frames)
    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        audio.gst_audio_converter_samples(conv, 0, in_ptrs, n,
                                          out_ptrs, out_frames)
    dt = time.perf_counter() - t0
    return {"metric": "ref_audioresample_48k_stereo_s16_to_16k_mono",
            "value": round(n * iters / dt / 1e6, 2), "unit": "Msamples/s",
            "note": "gst_audio_converter_samples (full chain: unpack, "
                    "mix, kaiser resample, F32 pack), single thread"}


def bench_blend_proxy():
    libs = gst_ref._load()
    gst, video = libs["gst"], libs["video"]
    video.gst_video_blend.restype = ctypes.c_bool
    video.gst_video_blend.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.c_float]

    def mk_frame(caps_str, write):
        info = gst_ref._video_info(caps_str)
        size, _, _ = gst_ref._info_geometry(info)
        mem = gst.g_malloc(size)
        buf = gst.gst_buffer_new_wrapped(mem, size)
        fr = ctypes.create_string_buffer(gst_ref.VIDEO_FRAME_SIZE)
        flag = gst_ref.GST_MAP_WRITE if write else gst_ref.GST_MAP_READ
        assert video.gst_video_frame_map(fr, info, buf,
                                         flag | gst_ref.GST_MAP_READ)
        return fr

    dest = mk_frame("video/x-raw,format=I420,width=3840,height=2160", True)
    srcs = [mk_frame("video/x-raw,format=I420,width=1920,height=1080", False)
            for _ in range(4)]
    pos = [(0, 0), (1920, 0), (0, 1080), (1920, 1080)]
    for _ in range(2):
        for s, (x, y) in zip(srcs, pos):
            video.gst_video_blend(dest, s, x, y, ctypes.c_float(1.0))
    iters = 25
    t0 = time.perf_counter()
    for _ in range(iters):
        for s, (x, y) in zip(srcs, pos):
            video.gst_video_blend(dest, s, x, y, ctypes.c_float(1.0))
    dt = time.perf_counter() - t0
    return {"metric": "ref_compositor_4x1080p_to_4k_mosaic_PROXY",
            "value": round(iters / dt, 1), "unit": "frames/s",
            "note": "PROXY: 4x gst_video_blend (video-blend.c) per output "
                    "frame; compositor's ORC blend is plugin-internal"}


def main():
    for fn in (bench_convert, bench_audio, bench_blend_proxy):
        try:
            print(json.dumps(fn()), flush=True)
        except Exception as e:
            print(json.dumps({"metric": fn.__name__, "error": repr(e)}),
                  flush=True)
    print(json.dumps({
        "metric": "ref_deinterlace_videobalance_1080i_chain",
        "value": None, "unit": "frames/s",
        "note": "not measurable: tvtime deinterlace methods are "
                "plugin-internal (no public API, gst-launch not installed)"}))


if __name__ == "__main__":
    main()
