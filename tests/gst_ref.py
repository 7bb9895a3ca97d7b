"""ctypes oracle: run the REAL GstVideoConverter from the system's
libgstvideo-1.0 (GStreamer 1.22) for bit-parity testing.

This is test-only scaffolding (not part of the framework): it lets the
suite assert our TPU converter's integer output is bit-identical to the
reference implementation actually executing on this machine.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from typing import Optional

import numpy as np

_libs = {}


def _load():
    if _libs:
        return _libs
    try:
        # RTLD_LOCAL (the default) is load-bearing: libgstreamer links
        # libunwind, whose _Unwind_* symbols would otherwise enter the
        # global namespace and shadow libgcc's unwinder for libraries
        # dlopened later — breaking C++ exception propagation in them
        # (libsrt-gnutls aborts in __gxx_personality_v0 on its first
        # internally-thrown exception).  libgstvideo resolves its
        # libgstreamer symbols through its own DT_NEEDED chain.
        gst = ctypes.CDLL("libgstreamer-1.0.so.0")
        video = ctypes.CDLL("libgstvideo-1.0.so.0")
    except OSError:
        return None
    gst.gst_init(None, None)
    _libs["gst"] = gst
    _libs["video"] = video

    gst.gst_caps_from_string.restype = ctypes.c_void_p
    gst.gst_caps_from_string.argtypes = [ctypes.c_char_p]
    gst.gst_buffer_new_wrapped.restype = ctypes.c_void_p
    gst.gst_buffer_new_wrapped.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
    gst.gst_structure_from_string.restype = ctypes.c_void_p
    gst.gst_structure_from_string.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
    gst.g_malloc.restype = ctypes.c_void_p
    gst.g_malloc.argtypes = [ctypes.c_size_t]

    video.gst_video_info_from_caps.restype = ctypes.c_bool
    video.gst_video_info_from_caps.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    video.gst_video_converter_new.restype = ctypes.c_void_p
    video.gst_video_converter_new.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                              ctypes.c_void_p]
    video.gst_video_converter_frame.argtypes = [ctypes.c_void_p,
                                                ctypes.c_void_p, ctypes.c_void_p]
    video.gst_video_frame_map.restype = ctypes.c_bool
    video.gst_video_frame_map.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                          ctypes.c_void_p, ctypes.c_int]
    video.gst_video_frame_unmap.argtypes = [ctypes.c_void_p]
    # register option enum GTypes so gst_structure_from_string can parse
    # typed values like (GstVideoAlphaMode)set
    for fn in ("gst_video_alpha_mode_get_type",
               "gst_video_chroma_mode_get_type",
               "gst_video_matrix_mode_get_type",
               "gst_video_gamma_mode_get_type",
               "gst_video_primaries_mode_get_type",
               "gst_video_resampler_method_get_type",
               "gst_video_dither_method_get_type"):
        try:
            getattr(video, fn)()
        except AttributeError:
            pass
    return _libs


# Config that forces the reference converter onto its GENERIC line-cache
# path: alpha-mode=set with alpha-value=1.0 produces byte-identical output
# to the default for alpha-less sources, but disqualifies the fastpath
# table entries that only support alpha copy.
GENERIC_CONFIG = ("video-converter-config, dither-quantization=(uint)0, "
                  "alpha-mode=(GstVideoAlphaMode)set, alpha-value=(double)1.0")


VIDEO_INFO_SIZE = 512
VIDEO_FRAME_SIZE = 4096
GST_MAP_READ = 1
GST_MAP_WRITE = 2

# GstVideoInfo field offsets (1.22 ABI, x86-64)
_OFF_SIZE = 24
_OFF_OFFSET = 72     # gsize offset[4]
_OFF_STRIDE = 104    # gint stride[4]


def _info_geometry(info) -> tuple:
    raw = bytes(info.raw)
    size = int.from_bytes(raw[_OFF_SIZE:_OFF_SIZE + 8], "little")
    offsets = [int.from_bytes(raw[_OFF_OFFSET + 8 * i:_OFF_OFFSET + 8 * i + 8],
                              "little") for i in range(4)]
    strides = [int.from_bytes(raw[_OFF_STRIDE + 4 * i:_OFF_STRIDE + 4 * i + 4],
                              "little") for i in range(4)]
    return size, offsets, strides


def plane_rows(fmt_name: str, w: int, h: int):
    """(n_rows, row_bytes) per memory plane for the tight layout our
    to_bytes/from_bytes produce."""
    import sys
    from gstreamer_tpu.video.format import format_info
    fmt = format_info(fmt_name)
    bps = fmt.bits // 8
    if fmt.layout == "planar":
        out = []
        for comp in fmt.plane_order:
            out.append((fmt.comp_height(comp, h),
                        fmt.comp_width(comp, w) * bps))
        return out
    if fmt.layout == "v210":
        from gstreamer_tpu.video.format import v210_stride
        return [(h, v210_stride(w))]
    if fmt.layout == "word32":
        return [(h, w * 4)]
    if fmt.layout == "bitfield16":
        return [(h, w * 2)]
    if fmt.layout == "iyu1":
        return [(h, (-(-w // 4)) * 6)]
    if fmt.layout == "tiled":
        # tiles are the memory layout; strides are tile-encoded — treat
        # each plane as one opaque "row"
        from gstreamer_tpu.video.format import _tiled_geometry
        _, tw, th, cth, xt, yt, cyt = _tiled_geometry(fmt, w, h)
        return [(1, xt * yt * tw * th), (1, xt * cyt * tw * cth)]
    if fmt.layout == "semi":
        out = [(h, w * bps),
               (fmt.comp_height(1, h), 2 * fmt.comp_width(1, w) * bps)]
        if fmt.has_alpha:           # AV12
            out.append((h, w * bps))
        return out
    if fmt.layout == "uyvp":
        from gstreamer_tpu.video.format import uyvp_rowbytes
        return [(h, uyvp_rowbytes(w))]
    if fmt.layout == "palette":
        return [(h, w), (1, 1024)]
    if fmt.layout in ("gray_le32", "semi_le32"):
        from gstreamer_tpu.video.format import le32_rowwords
        rb = le32_rowwords(w) * 4
        if fmt.is_gray:
            return [(h, rb)]
        return [(h, rb), (fmt.comp_height(1, h), rb)]
    if fmt.layout == "semi_le40":
        from gstreamer_tpu.video.format import le40_rowbytes
        return [(h, le40_rowbytes(w)),
                (fmt.comp_height(1, h), le40_rowbytes(2 * fmt.comp_width(1, w)))]
    if fmt.layout == "tiled_le40":
        from gstreamer_tpu.video.format import _tiled_le40_geometry
        ntx, nty, cyt = _tiled_le40_geometry(w, h)
        return [(1, ntx * nty * 20), (1, ntx * cyt * 20)]
    if fmt.layout == "tiled_be10":
        from gstreamer_tpu.video.format import _tiled_be10_geometry
        _, ntx, yt, uvyt = _tiled_be10_geometry(w, h)
        return [(1, ntx * yt * 1024), (1, ntx * uvyt * 1024)]
    if fmt.layout == "mt2110":
        from gstreamer_tpu.video.format import _mt2110_geometry
        ntx, nty = _mt2110_geometry(w, h)
        return [(1, ntx * nty * 640), (1, ntx * nty * 320)]
    # packed
    if fmt.is_rgb or fmt.name in ("AYUV", "VUYA", "AYUV64", "ARGB64"):
        return [(h, w * len(fmt.packed_order) * bps)]
    from gstreamer_tpu.video.format import _is_packed_letters
    if _is_packed_letters(fmt):
        return [(h, w * len(fmt.packed_order) * bps)]
    return [(h, (-(-w // 2)) * 4 * bps)]


def _tight_to_strided(fmt_name, w, h, tight: np.ndarray, size, offsets, strides):
    out = np.zeros(size, np.uint8)
    pos = 0
    for plane, (rows, rowbytes) in enumerate(plane_rows(fmt_name, w, h)):
        for r in range(rows):
            out[offsets[plane] + r * strides[plane]:
                offsets[plane] + r * strides[plane] + rowbytes] = \
                tight[pos:pos + rowbytes]
            pos += rowbytes
    return out


def _strided_to_tight(fmt_name, w, h, strided: np.ndarray, offsets, strides):
    chunks = []
    for plane, (rows, rowbytes) in enumerate(plane_rows(fmt_name, w, h)):
        for r in range(rows):
            start = offsets[plane] + r * strides[plane]
            chunks.append(strided[start:start + rowbytes])
    return np.concatenate(chunks)


def available() -> bool:
    return _load() is not None


def _video_info(caps_str: str):
    libs = _load()
    gst, video = libs["gst"], libs["video"]
    caps = gst.gst_caps_from_string(caps_str.encode())
    if not caps:
        raise ValueError(f"bad caps {caps_str!r}")
    info = ctypes.create_string_buffer(VIDEO_INFO_SIZE)
    if not video.gst_video_info_from_caps(info, caps):
        raise ValueError(f"cannot build video info from {caps_str!r}")
    return info


def _parse_caps_geom(caps: str):
    fields = dict(
        kv.split("=", 1) for kv in caps.split(",")[1:] if "=" in kv)
    return (fields["format"].strip(), int(fields["width"]),
            int(fields["height"]))


def convert_frame(in_caps: str, out_caps: str, in_bytes: np.ndarray,
                  config: Optional[str] = None) -> np.ndarray:
    """Run gst_video_converter_frame on raw frame bytes.

    in_bytes: flat uint8 frame in the TIGHT in_caps memory layout (as
    produced by gstreamer_tpu.video.format.to_bytes).  Returns the tight
    flat uint8 frame in the out_caps layout."""
    libs = _load()
    gst, video = libs["gst"], libs["video"]

    in_info = _video_info(in_caps)
    out_info = _video_info(out_caps)
    in_fmt, iw, ih = _parse_caps_geom(in_caps)
    out_fmt, ow, oh = _parse_caps_geom(out_caps)
    in_size, in_offsets, in_strides = _info_geometry(in_info)
    out_size, out_offsets, out_strides = _info_geometry(out_info)

    cfg = None
    if config:
        cfg = gst.gst_structure_from_string(config.encode(), None)
        if not cfg:
            raise ValueError(f"bad config {config!r}")

    conv = video.gst_video_converter_new(in_info, out_info, cfg)
    if not conv:
        raise RuntimeError(f"no converter for {in_caps} -> {out_caps}")

    in_bytes = np.ascontiguousarray(in_bytes, dtype=np.uint8).reshape(-1)
    strided = _tight_to_strided(in_fmt, iw, ih, in_bytes, in_size,
                                in_offsets, in_strides)
    src_mem = gst.g_malloc(in_size)
    ctypes.memmove(src_mem, strided.ctypes.data, in_size)
    src_buf = gst.gst_buffer_new_wrapped(src_mem, in_size)

    dst_mem = gst.g_malloc(out_size)
    dst_buf = gst.gst_buffer_new_wrapped(dst_mem, out_size)

    src_frame = ctypes.create_string_buffer(VIDEO_FRAME_SIZE)
    dst_frame = ctypes.create_string_buffer(VIDEO_FRAME_SIZE)
    if not video.gst_video_frame_map(src_frame, in_info, src_buf, GST_MAP_READ):
        raise RuntimeError("map src failed")
    if not video.gst_video_frame_map(dst_frame, out_info, dst_buf, GST_MAP_WRITE):
        raise RuntimeError("map dst failed")

    video.gst_video_converter_frame(conv, src_frame, dst_frame)

    out_strided = np.frombuffer(
        ctypes.string_at(dst_mem, out_size), dtype=np.uint8).copy()
    video.gst_video_frame_unmap(src_frame)
    video.gst_video_frame_unmap(dst_frame)
    return _strided_to_tight(out_fmt, ow, oh, out_strided, out_offsets,
                             out_strides)
