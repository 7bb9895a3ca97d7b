"""VideoConverter — any-to-any video format/size/colorimetry conversion.

TPU-native re-design of GstVideoConverter
(subprojects/gst-plugins-base/gst-libs/gst/video/video-converter.c — the
11-stage line-cache pipeline documented at video-converter.c:56-96).

Instead of a pull-based per-line cache chain executed by threads, the
negotiated configuration compiles to ONE pure function over whole batched
frames: unpack → chroma-upsample → h/v-scale → color-matrix →
chroma-downsample → pack — which XLA fuses into a single program.  Stage
order and every integer rounding matches the reference generic path:

* stage order: chain_unpack_line :851 → chain_upsample :880 →
  chain_hscale/vscale/scale :1610-1717 (pixel-count rule) →
  chain_convert :1719 (matrix) → chain_downsample :2017 → chain_pack :2098
* chroma resample condition: video_converter_compute_resample :2849
* matrix path selection: prepare_matrix :1323
* scaling: SCALE_U8=12 fixed-point taps (video-scaler.c)

The same pipeline runs under numpy (`convert_ref`, the gold used in parity
tests) and under jax.numpy inside jit (`convert`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

from . import chroma as chroma_mod
from . import color as color_mod
from . import scaler as scaler_mod
from .format import format_info, pack, unpack
from .info import (VideoInfo, chroma_site_h_cosited, chroma_site_v_cosited)


DEFAULTS = {
    "resampler-method": scaler_mod.METHOD_CUBIC,   # video-converter.c:790
    "resampler-taps": 0,
    "chroma-resampler-method": scaler_mod.METHOD_LINEAR,
    "chroma-mode": "full",      # full | upsample-only | downsample-only | none
    "matrix-mode": "full",      # full | input-only | output-only | none
    "dither-method": "bayer",   # DEFAULT_OPT_DITHER_METHOD (:793)
    "dither-quantization": 1,   # DEFAULT_OPT_DITHER_QUANTIZATION (:794)
    "alpha-mode": "copy",
    "alpha-value": 1.0,
    "fill-border": True,
}


class _UnpackFinfo:
    """Shim standing in for the UNPACK format's GstVideoFormatInfo when
    computing range offsets (the converter computes offsets against
    AYUV/AYUV64, i.e. full 8/16-bit depth — video-converter.c:1380)."""

    def __init__(self, finfo):
        self.is_yuv = finfo.is_yuv or finfo.is_gray
        self.is_rgb = finfo.is_rgb
        self.is_gray = False
        self.depth = (finfo.bits,) * 4


def _unpack_finfo(finfo):
    return _UnpackFinfo(finfo)


class VideoConverter:
    def __init__(self, in_info: VideoInfo, out_info: VideoInfo,
                 config: Optional[Dict[str, Any]] = None):
        self.in_info = in_info
        self.out_info = out_info
        self.config = dict(DEFAULTS)
        if config:
            self.config.update(config)
        self._plan = self._make_plan()
        self._jit_fn = None

    # -- planning (trace time) -------------------------------------------
    def _make_plan(self):
        ii, oi = self.in_info, self.out_info
        ifmt, ofmt = ii.finfo, oi.finfo
        cfg = self.config
        plan: Dict[str, Any] = {}

        # src/dest rectangles (gst_video_converter_new :2306-2363):
        # crop offsets round DOWN to chroma alignment; sizes clamp to the
        # frame.  The convert chain runs at the rect sizes; _finish embeds
        # the result at (out_x, out_y) and fills the border.
        in_x = int(cfg.get("src-x", 0)) & ~((1 << ifmt.w_sub[1]) - 1)
        in_y = int(cfg.get("src-y", 0)) & ~((1 << ifmt.h_sub[1]) - 1)
        in_w = int(cfg.get("src-width", ii.width - in_x))
        in_h = int(cfg.get("src-height", ii.height - in_y))
        in_w = max(0, min(in_w, ii.width - in_x))
        in_h = max(0, min(in_h, ii.height - in_y))
        out_x = int(cfg.get("dest-x", 0)) & ~((1 << ofmt.w_sub[1]) - 1)
        out_y = int(cfg.get("dest-y", 0)) & ~((1 << ofmt.h_sub[1]) - 1)
        out_w = int(cfg.get("dest-width", oi.width - out_x))
        out_h = int(cfg.get("dest-height", oi.height - out_y))
        out_w = max(0, min(out_w, oi.width - out_x))
        out_h = max(0, min(out_h, oi.height - out_y))
        plan["rect"] = (in_x, in_y, in_w, in_h, out_x, out_y, out_w, out_h)
        plan["rect_active"] = (
            (in_x, in_y, in_w, in_h) != (0, 0, ii.width, ii.height)
            or (out_x, out_y, out_w, out_h) != (0, 0, oi.width, oi.height))

        chroma_mode = cfg["chroma-mode"]
        # video_converter_compute_resample condition (:2866)
        need_resample = (
            chroma_mode != "none"
            and (ifmt.w_sub[1] != ofmt.w_sub[1]
                 or ifmt.h_sub[1] != ofmt.h_sub[1]
                 or ii.chroma_site != oi.chroma_site
                 or in_w != out_w
                 or in_h != out_h)
        )
        plan["upsample"] = (
            need_resample and chroma_mode != "downsample-only"
            and (ifmt.w_sub[1] or ifmt.h_sub[1]))
        plan["downsample"] = (
            need_resample and chroma_mode != "upsample-only"
            and (ofmt.w_sub[1] or ofmt.h_sub[1]))
        plan["up_h_cosited"] = chroma_site_h_cosited(ii.chroma_site)
        plan["up_v_cosited"] = chroma_site_v_cosited(ii.chroma_site)
        plan["down_h_cosited"] = chroma_site_h_cosited(oi.chroma_site)
        plan["down_v_cosited"] = chroma_site_v_cosited(oi.chroma_site)

        # scaling plan (chain_scale :1684 — fewer intermediate pixels first)
        method = cfg["resampler-method"]
        taps = cfg["resampler-taps"]
        rkw = {}
        if "cubic-b" in cfg:
            rkw["cubic_b"] = cfg["cubic-b"]
        if "cubic-c" in cfg:
            rkw["cubic_c"] = cfg["cubic-c"]
        if taps:
            # GST_VIDEO_RESAMPLER_OPT_MAX_TAPS semantics: a tap budget
            rkw["max_taps_opt"] = taps
            taps = 0
        # interlaced frames get field-aware vertical filters
        # (video-converter.c :3301 selects upsample_i/v_scaler_i when the
        # frame is interlaced and mode is not alternate; we key off the
        # negotiated interlace-mode since whole batches share one program)
        plan["interlaced"] = ii.interlace_mode in ("interleaved", "mixed")
        h_res = v_res = None
        if in_w != out_w:
            h_res = scaler_mod.make_resampler(method, in_w, out_w, taps,
                                              **rkw)
        if in_h != out_h:
            if plan["interlaced"]:
                v_res = scaler_mod.make_resampler_interlaced(
                    method, in_h, out_h, taps, **rkw)
            else:
                v_res = scaler_mod.make_resampler(method, in_h, out_h,
                                                  taps, **rkw)
        s1 = out_w * in_h
        s2 = in_w * out_h
        plan["scale_order"] = "hv" if s1 <= s2 else "vh"
        # chain_scale is invoked twice (video-converter.c:2522,2528): all
        # scaling happens BEFORE the color matrix when the total pixel count
        # shrinks, AFTER it otherwise.
        plan["scale_before_matrix"] = (out_w * out_h <= in_w * in_h)
        plan["h_res"], plan["v_res"] = h_res, v_res

        # matrix plan (chain_convert :1719) — range offsets are computed
        # against the UNPACK format (AYUV/AYUV64), i.e. full 8/16-bit depth
        matrix_mode = cfg["matrix-mode"]
        in_bits, out_bits = ifmt.bits, ofmt.bits
        plan["unpack_bits"], plan["pack_bits"] = in_bits, out_bits

        # gamma remap + primaries conversion (chain_convert_to_RGB :1566,
        # chain_convert primaries block :1752, chain_convert_to_YUV :1955)
        do_gamma = cfg.get("gamma-mode", "none") == "remap"
        same_primaries = (
            cfg.get("primaries-mode", "none") == "none"
            or color_mod.primaries_is_equivalent(
                ii.colorimetry.primaries, oi.colorimetry.primaries))
        plan["do_gamma"] = do_gamma
        conv = color_mod.identity()
        if not same_primaries:
            conv = color_mod.primaries_convert_matrix(
                ii.colorimetry.primaries, oi.colorimetry.primaries)

        if not do_gamma:
            m = conv
            if in_bits < out_bits:
                s = 1 << (out_bits - in_bits)
                m = color_mod.scale_components(
                    m, *(float(np.float32(1.0) / np.float32(s)),) * 3)
            m = color_mod.compute_matrix_to_rgb(
                m, ii.colorimetry, _unpack_finfo(ifmt),
                matrix_mode_none=(matrix_mode == "none"))
            m = color_mod.compute_matrix_to_yuv(
                m, oi.colorimetry, _unpack_finfo(ofmt),
                matrix_mode_none=(matrix_mode == "none"))
            if in_bits > out_bits:
                s = float(np.float32(1 << (in_bits - out_bits)))
                m = color_mod.scale_components(m, s, s, s)
            plan["matrix"] = color_mod.prepare_matrix(
                m, unpack_rgb=ifmt.is_rgb, pack_rgb=ofmt.is_rgb,
                bits=max(in_bits, out_bits))
        else:
            # to-RGB matrix at unpack bits (only when input is YUV)
            if ifmt.is_rgb:
                plan["to_rgb"] = None
            else:
                m1 = color_mod.compute_matrix_to_rgb(
                    color_mod.identity(), ii.colorimetry,
                    _unpack_finfo(ifmt),
                    matrix_mode_none=(matrix_mode == "none"))
                s = float(1 << in_bits)
                m1 = color_mod.scale_components(m1, s, s, s)
                plan["to_rgb"] = color_mod.prepare_matrix(
                    m1, unpack_rgb=False, pack_rgb=True, bits=in_bits)
            plan["gamma_dec"] = color_mod.gamma_decode_table(
                ii.colorimetry.transfer, in_bits)
            # linear-light primaries conversion at 16 bits
            plan["matrix"] = (color_mod.prepare_matrix(
                conv, unpack_rgb=True, pack_rgb=True, bits=16)
                if not same_primaries else None)
            plan["gamma_enc"] = color_mod.gamma_encode_table(
                oi.colorimetry.transfer, out_bits)
            # to-YUV matrix at pack bits (only when output is YUV)
            if ofmt.is_rgb:
                plan["to_yuv"] = None
            else:
                s = 1.0 / float(1 << out_bits)
                m2 = color_mod.scale_components(color_mod.identity(),
                                                s, s, s)
                m2 = color_mod.compute_matrix_to_yuv(
                    m2, oi.colorimetry, _unpack_finfo(ofmt),
                    matrix_mode_none=(matrix_mode == "none"))
                plan["to_yuv"] = color_mod.prepare_matrix(
                    m2, unpack_rgb=True, pack_rgb=False, bits=out_bits)

        # border color (setup_borderline :2188): ARGB (0xAARRGGBB) taken
        # to the output space; YUV via the 8-bit to-YUV 3x3 with hardcoded
        # 16/128 offsets.  16-bit containers inherit the reference's
        # splat2_u64 lane layout verbatim.
        if plan["rect_active"]:
            argb = int(cfg.get("border-argb", 0xFF000000)) & 0xFFFFFFFF
            ba = (argb >> 24) & 0xFF
            br = (argb >> 16) & 0xFF
            bg = (argb >> 8) & 0xFF
            bb = argb & 0xFF
            if ofmt.is_rgb:
                bc = (ba, br, bg, bb)
                val32 = ((bb << 24) | (bg << 16) | (br << 8) | ba)
            else:
                m2 = color_mod.compute_matrix_to_yuv(
                    color_mod.identity(), oi.colorimetry,
                    _unpack_finfo(ofmt), matrix_mode_none=False)
                im = np.rint(m2 * 256.0).astype(np.int64)
                by = 16 + int((br * im[0][0] + bg * im[0][1]
                               + bb * im[0][2]) >> 8)
                bu = 128 + int((br * im[1][0] + bg * im[1][1]
                                + bb * im[1][2]) >> 8)
                bv = 128 + int((br * im[2][0] + bg * im[2][1]
                                + bb * im[2][2]) >> 8)
                by, bu, bv = (max(0, min(255, x)) for x in (by, bu, bv))
                bc = (ba, by, bu, bv)
                val32 = (ba | (by << 8) | (bu << 16) | (bv << 24))
            if out_bits == 16:
                lane0, lane1 = val32 & 0xFFFF, (val32 >> 16) & 0xFFFF
                bc = (lane0, lane1, lane0, lane1)
            plan["border"] = bc
        else:
            plan["border"] = None

        # dither plan (chain_dither :2034)
        from . import dither as dither_mod
        plan["dither"] = dither_mod.make_converter_dither(
            cfg["dither-method"], int(cfg.get("dither-quantization", 1)),
            ofmt, out_bits)

        # fused Pallas ingest kernel (ops/convert_kernel.py) eligibility:
        # 8-bit 4:2:0 -> downscale, h-first, no alpha
        from ..ops import convert_kernel as ck
        plan["pallas_ok"] = (
            ck.applicable(ifmt, ii, oi, plan)
            and not ifmt.has_alpha
            and not plan["do_gamma"]
            and not plan["rect_active"]
            and not plan["interlaced"]
            and (plan["v_res"] is None or plan["scale_order"] == "hv"))
        return plan

    # -- execution ---------------------------------------------------------
    def _pipeline(self, xp, planes):
        """planes (component arrays of in_info) -> planes of out_info.

        Internal representation is a tuple of per-channel planes
        (A, c0, c1, c2), each (..., H, W) — the TPU-native layout (full
        lane utilization; channel-last (...,4) arrays tile poorly)."""
        ii, oi = self.in_info, self.out_info
        ifmt, ofmt = ii.finfo, oi.finfo
        plan = self._plan

        from .format import pack_planes, unpack_planes

        if (xp is not np and plan["pallas_ok"] and self._pallas_enabled()):
            return self._pipeline_pallas(xp, planes)

        # int16 is wide enough for every stage up to the matrix (values
        # <=255, chroma filter sums <=1277) and halves HBM traffic; the
        # alpha plane is skipped entirely when neither side carries alpha
        # (it would be a constant 255 all the way through).
        # When upsampling 2x-subsampled chroma, unpack keeps the chroma
        # planes at their stored (half) resolution and up2_half produces
        # the full-res plane directly — skipping the nearest-duplicated
        # intermediate (a full-res int16 HBM round-trip per plane/axis
        # whose duplicated samples up2 would immediately re-stride away).
        sub_up = (plan["upsample"] and not ifmt.is_gray
                  and ifmt.w_sub[1] <= 1 and ifmt.h_sub[1] <= 1
                  # interlaced vertical up2 runs on the nearest-duplicated
                  # full-res plane (4-line field groups), so the direct
                  # from-half shortcut doesn't apply
                  and not (plan["interlaced"] and ifmt.h_sub[1] == 1))
        # Phase-split fast path: 4:2:0 upsample + downscale in "hv" order.
        # The full-width chroma plane is NEVER materialized — up2 produces
        # even/odd column/row phases at the stored (quarter) resolution and
        # the h/v scales contract them against the tap matrix's even/odd
        # columns (bit-identical; the parity split happens before the
        # fixed-point rounding).  Kills the interleave relayout and 3/4 of
        # the chroma HBM traffic.
        phase_split = (
            sub_up and ifmt.w_sub[1] == 1
            and plan["scale_before_matrix"] and plan["scale_order"] == "hv"
            and plan["h_res"] is not None
            and (plan["unpack_bits"] == 8 and not plan["do_gamma"])
            and not plan["interlaced"]
            and not getattr(self, "_disable_phase_split", False))
        # Fused Pallas chroma kernel (ops/chroma420_kernel.py): the 4:2:0
        # up2-phases + split-tap h/v scale never leave VMEM — replaces the
        # XLA phase-split chroma path (4 materialized bf16 phase operands,
        # ~2/3 of the converter's HBM traffic).  Bit-identical.
        if (phase_split
                and ifmt.h_sub[1] == 1 and plan["v_res"] is not None
                and not plan["rect_active"]
                and ii.width % 2 == 0 and ii.height % 2 == 0
                and ifmt.layout == "planar" and not ifmt.has_alpha
                and ifmt.bits == 8):
            from ..ops import chroma420_gather as ckg
            from ..ops import chroma420_kernel as ck420
            cw = planes[1].shape[-1]
            chh = planes[1].shape[-2]
            # 2-tap scalers: the static-gather formulation (pure XLA,
            # any backend) — the fastest path measured on TPU
            if (xp is not np
                    and ckg.applicable(plan["h_res"], plan["v_res"],
                                       cw, chh)):
                return self._pipeline_chroma_kernel(xp, planes,
                                                    use_gather=True)
            ck_mode = self._chroma_kernel_mode(xp)
            if (ck_mode is not None
                    and ck420.applicable(plan["h_res"], plan["v_res"],
                                         cw, chh)):
                return self._pipeline_chroma_kernel(
                    xp, planes, interpret=(ck_mode == "interpret"))
        in_x, in_y, in_w, in_h = plan["rect"][:4]
        if (in_x, in_y, in_w, in_h) != (0, 0, ii.width, ii.height):
            # SRC rect crop: offsets are chroma-aligned so per-component
            # slices stay integral
            planes = tuple(
                p[..., in_y >> ifmt.h_sub[min(c, len(ifmt.h_sub) - 1)]:
                  (in_y + in_h + (1 << ifmt.h_sub[min(c, len(ifmt.h_sub) - 1)])
                   - 1) >> ifmt.h_sub[min(c, len(ifmt.h_sub) - 1)],
                  in_x >> ifmt.w_sub[min(c, len(ifmt.w_sub) - 1)]:
                  (in_x + in_w + (1 << ifmt.w_sub[min(c, len(ifmt.w_sub) - 1)])
                   - 1) >> ifmt.w_sub[min(c, len(ifmt.w_sub) - 1)]]
                for c, p in enumerate(planes))
        chans = unpack_planes(xp, ifmt, planes, in_w, in_h,
                              dtype=xp.int16, subsampled_chroma=sub_up)
        skip_alpha = not ifmt.has_alpha and not ofmt.has_alpha
        if skip_alpha:
            chans = (None,) + chans[1:]

        if phase_split:
            return self._pipeline_phase_split(xp, chans)

        if plan["upsample"]:
            # h first, then v (MAKE_UPSAMPLE_V2 calls h_resample first)
            a, y, u, v = chans
            if sub_up:
                if ifmt.w_sub[1] == 1:
                    u = chroma_mod.up2_half(xp, u, -1, plan["up_h_cosited"],
                                            in_w)
                    v = chroma_mod.up2_half(xp, v, -1, plan["up_h_cosited"],
                                            in_w)
                if ifmt.h_sub[1] == 1:
                    u = chroma_mod.up2_half(xp, u, -2, plan["up_v_cosited"],
                                            in_h)
                    v = chroma_mod.up2_half(xp, v, -2, plan["up_v_cosited"],
                                            in_h)
            else:
                if ifmt.w_sub[1] == 1:
                    u = chroma_mod.up2(xp, u, -1, plan["up_h_cosited"])
                    v = chroma_mod.up2(xp, v, -1, plan["up_h_cosited"])
                elif ifmt.w_sub[1] == 2:
                    u = chroma_mod.up4(xp, u, -1, plan["up_h_cosited"])
                    v = chroma_mod.up4(xp, v, -1, plan["up_h_cosited"])
                if ifmt.h_sub[1] == 1:
                    up_v = (chroma_mod.up2_interlaced if plan["interlaced"]
                            else chroma_mod.up2)
                    u = up_v(xp, u, -2, plan["up_v_cosited"])
                    v = up_v(xp, v, -2, plan["up_v_cosited"])
                elif ifmt.h_sub[1] == 2:
                    u = chroma_mod.up4(xp, u, -2, plan["up_v_cosited"])
                    v = chroma_mod.up4(xp, v, -2, plan["up_v_cosited"])
            chans = (a, y, u, v)

        do_gamma = plan["do_gamma"]
        scale_bits = (16 if do_gamma
                      else (plan["unpack_bits"] if plan["scale_before_matrix"]
                            else plan["pack_bits"]))

        def do_scale(chans):
            def sc(c, axis, res):
                if c is None:
                    return None
                return scaler_mod.scale_axis_exact(
                    xp, c, axis, res,
                    precision=scaler_mod.SCALE_U8,
                    value_bits=scale_bits)

            if plan["scale_order"] == "hv":
                if plan["h_res"] is not None:
                    chans = tuple(sc(c, -1, plan["h_res"]) for c in chans)
                if plan["v_res"] is not None:
                    chans = tuple(sc(c, -2, plan["v_res"]) for c in chans)
            else:
                if plan["v_res"] is not None:
                    chans = tuple(sc(c, -2, plan["v_res"]) for c in chans)
                if plan["h_res"] is not None:
                    chans = tuple(sc(c, -1, plan["h_res"]) for c in chans)
            return chans

        if do_gamma:
            # chain_convert_to_RGB: matrix to R'G'B' at unpack bits, then
            # gamma decode through the LUT -> 16-bit linear ARGB64
            if plan["to_rgb"] is not None:
                chans = color_mod.apply_prepared_planes(xp, chans,
                                                        plan["to_rgb"])
            chans = color_mod.apply_gamma_decode_planes(
                xp, chans, plan["gamma_dec"], plan["unpack_bits"])

        if plan["scale_before_matrix"]:
            chans = do_scale(chans)

        if do_gamma:
            # chain_convert in linear light: only the (optional) primaries
            # conversion matrix
            if plan["matrix"] is not None:
                chans = color_mod.apply_prepared_planes(xp, chans,
                                                        plan["matrix"])
        else:
            # conversion stage (do_convert_lines): optional 8->16 widening
            # (v*257, video_orc_convert_u8_to_u16), matrix, 16->8 narrowing
            # (>>8, video_orc_convert_u16_to_u8)
            pm = plan["matrix"]
            in_bits, out_bits = plan["unpack_bits"], plan["pack_bits"]
            if in_bits == 8 and out_bits == 16:
                chans = tuple(c if c is None else (c.astype(xp.int32) * 257)
                              for c in chans)
            chans = color_mod.apply_prepared_planes(xp, chans, pm)
            if in_bits == 16 and out_bits == 8:
                chans = tuple(c if c is None else (c.astype(xp.int32) >> 8)
                              for c in chans)

        if not plan["scale_before_matrix"]:
            chans = do_scale(chans)

        if do_gamma:
            # chain_convert_to_YUV: gamma encode to pack bits, then the
            # to-YUV matrix
            chans = color_mod.apply_gamma_encode_planes(
                xp, chans, plan["gamma_enc"], plan["pack_bits"])
            if plan["to_yuv"] is not None:
                chans = color_mod.apply_prepared_planes(xp, chans,
                                                        plan["to_yuv"])

        if plan["downsample"]:
            # v first, then h (MAKE_DOWNSAMPLE_V2 filters lines then h)
            a, y, u, v = chans
            if ofmt.h_sub[1] == 1:
                dn_v = (chroma_mod.down2_interlaced if plan["interlaced"]
                        else chroma_mod.down2)
                u = dn_v(xp, u, -2, plan["down_v_cosited"])
                v = dn_v(xp, v, -2, plan["down_v_cosited"])
            elif ofmt.h_sub[1] == 2:
                u = chroma_mod.down4(xp, u, -2, plan["down_v_cosited"])
                v = chroma_mod.down4(xp, v, -2, plan["down_v_cosited"])
            if ofmt.w_sub[1] == 1:
                u = chroma_mod.down2(xp, u, -1, plan["down_h_cosited"])
                v = chroma_mod.down2(xp, v, -1, plan["down_h_cosited"])
            elif ofmt.w_sub[1] == 2:
                u = chroma_mod.down4(xp, u, -1, plan["down_h_cosited"])
                v = chroma_mod.down4(xp, v, -1, plan["down_h_cosited"])
            chans = (a, y, u, v)

        return self._finish(xp, chans)

    def _pipeline_phase_split(self, xp, chans):
        """Chroma-phase-split execution (see _pipeline): 4:2:x chroma is
        upsampled as separate even/odd parity phases at stored resolution
        and scaled via split-tap contraction — bit-identical to the
        sequential up2 -> scale chain."""
        ii, oi = self.in_info, self.out_info
        ifmt, ofmt = ii.finfo, oi.finfo
        plan = self._plan
        from .format import pack_planes

        a, y, u, v = chans
        h_res, v_res = plan["h_res"], plan["v_res"]

        def sc(c, axis, res):
            if c is None or res is None:
                return c
            return scaler_mod.scale_axis_exact(
                xp, c, axis, res, precision=scaler_mod.SCALE_U8,
                value_bits=8)

        y = sc(sc(y, -1, h_res), -2, v_res)
        a = sc(sc(a, -1, h_res), -2, v_res)

        def chroma(c):
            ce, co = chroma_mod.up2_phases(xp, c, -1, plan["up_h_cosited"])
            if ifmt.h_sub[1] == 1:
                ce_re, ce_ro = chroma_mod.up2_phases(
                    xp, ce, -2, plan["up_v_cosited"])
                co_re, co_ro = chroma_mod.up2_phases(
                    xp, co, -2, plan["up_v_cosited"])
                h_re = scaler_mod.scale_cols_split_exact(xp, ce_re, co_re,
                                                         h_res)
                h_ro = scaler_mod.scale_cols_split_exact(xp, ce_ro, co_ro,
                                                         h_res)
                if v_res is not None:
                    return scaler_mod.scale_rows_split_exact(xp, h_re, h_ro,
                                                             v_res)
                st = xp.stack([h_re, h_ro], axis=-2)
                full = st.reshape(h_re.shape[:-2]
                                  + (h_re.shape[-2] * 2, h_re.shape[-1]))
                return full[..., :plan["rect"][3], :]
            out = scaler_mod.scale_cols_split_exact(xp, ce, co, h_res)
            return sc(out, -2, v_res)

        u = chroma(u)
        v = chroma(v)
        chans = (a, y, u, v)

        pm = plan["matrix"]
        in_bits, out_bits = plan["unpack_bits"], plan["pack_bits"]
        if in_bits == 8 and out_bits == 16:
            chans = tuple(c if c is None else (c.astype(xp.int32) * 257)
                          for c in chans)
        chans = color_mod.apply_prepared_planes(xp, chans, pm)

        if plan["downsample"]:
            a, yy, uu, vv = chans
            if ofmt.h_sub[1] == 1:
                uu = chroma_mod.down2(xp, uu, -2, plan["down_v_cosited"])
                vv = chroma_mod.down2(xp, vv, -2, plan["down_v_cosited"])
            elif ofmt.h_sub[1] == 2:
                uu = chroma_mod.down4(xp, uu, -2, plan["down_v_cosited"])
                vv = chroma_mod.down4(xp, vv, -2, plan["down_v_cosited"])
            if ofmt.w_sub[1] == 1:
                uu = chroma_mod.down2(xp, uu, -1, plan["down_h_cosited"])
                vv = chroma_mod.down2(xp, vv, -1, plan["down_h_cosited"])
            elif ofmt.w_sub[1] == 2:
                uu = chroma_mod.down4(xp, uu, -1, plan["down_h_cosited"])
                vv = chroma_mod.down4(xp, vv, -1, plan["down_h_cosited"])
            chans = (a, yy, uu, vv)

        return self._finish(xp, chans)

    def _finish(self, xp, chans):
        """dither -> dest-rect embed with border fill -> pack."""
        oi = self.out_info
        ofmt = oi.finfo
        plan = self._plan
        from .format import pack_planes

        _, _, _, _, out_x, out_y, out_w, out_h = plan["rect"]
        if plan["dither"] is not None:
            chans = plan["dither"].apply(xp, chans, out_h, out_w)

        if plan["rect_active"]:
            border = plan["border"]
            maxv = 255 if plan["pack_bits"] == 8 else 65535
            new = []
            for i, c in enumerate(chans):
                if c is None:
                    # materialize alpha only if the output stores it and
                    # the border alpha differs from opaque
                    if i == 0 and ofmt.has_alpha:
                        c = xp.full(
                            chans[1].shape[:-2] + (out_h, out_w),
                            maxv, dtype=xp.int32)
                    else:
                        new.append(None)
                        continue
                full_shape = c.shape[:-2] + (oi.height, oi.width)
                bg = xp.full(full_shape, int(border[i]), dtype=c.dtype)
                sl = (Ellipsis, slice(out_y, out_y + out_h),
                      slice(out_x, out_x + out_w))
                if hasattr(bg, "at"):
                    bg = bg.at[sl].set(c)
                else:
                    bg[sl] = c
                new.append(bg)
            chans = tuple(new)

        return pack_planes(xp, ofmt, chans, oi.width, oi.height)

    def _chroma_kernel_mode(self, xp):
        """'tpu' | 'interpret' | None — GTPU_PALLAS_CHROMA gates the
        fused 4:2:0 chroma kernel (default: ON for the TPU backend;
        'interpret' runs the Pallas interpreter for CPU tests; '0' off)."""
        import os

        if xp is np:
            return None
        mode = os.environ.get("GTPU_PALLAS_CHROMA", "1")
        if mode == "interpret":
            return "interpret"
        if mode == "1":
            import jax
            return "tpu" if jax.default_backend() == "tpu" else None
        return None

    def _yscale_kernel_on(self, xp, interpret: bool) -> bool:
        """GTPU_PALLAS_YSCALE gates the fused luma h+v Pallas kernel
        (default ON for the real TPU backend; no interpreter path —
        CPU tests run the identical-output XLA scaler)."""
        import os

        if xp is np or interpret:
            return False
        if os.environ.get("GTPU_PALLAS_YSCALE", "1") != "1":
            return False
        import jax

        return jax.default_backend() == "tpu"

    def _pipeline_chroma_kernel(self, xp, planes, interpret: bool = False,
                                use_gather: bool = False):
        """4:2:0 fast path: chroma runs either in the 2-tap static-gather
        formulation (ops/chroma420_gather.py, pure XLA) or in the fused
        dense-tap Pallas kernel; luma scales straight from the stored
        uint8 plane (no int16 staging copy).  Bit-identical to
        _pipeline_phase_split."""
        oi = self.out_info
        ofmt = oi.finfo
        plan = self._plan

        h_res, v_res = plan["h_res"], plan["v_res"]
        y = None
        if self._yscale_kernel_on(xp, interpret):
            from ..ops import yscale_kernel as ysk

            if ysk.applicable(h_res, v_res, self.in_info.height,
                              self.in_info.width):
                # fused h+v in one Pallas kernel: the u8 -> bf16
                # operand expansion happens in VMEM, so the full-res
                # bf16 never round-trips HBM (30% faster on v5e,
                # bit-exact)
                y = ysk.yscale_hv(planes[0], h_res, v_res,
                                  precision=scaler_mod.SCALE_U8)
        if y is None:
            y = scaler_mod.scale_axis_exact(
                xp, planes[0], -1, h_res, precision=scaler_mod.SCALE_U8,
                value_bits=8)
            y = scaler_mod.scale_axis_exact(
                xp, y, -2, v_res, precision=scaler_mod.SCALE_U8,
                value_bits=8)

        if use_gather:
            from ..ops import chroma420_gather as ckg
            u = ckg.chroma420_scale_2tap(
                xp, planes[1], h_res, v_res, plan["up_h_cosited"],
                plan["up_v_cosited"])
            v = ckg.chroma420_scale_2tap(
                xp, planes[2], h_res, v_res, plan["up_h_cosited"],
                plan["up_v_cosited"])
        else:
            from ..ops import chroma420_kernel as ck420
            u = ck420.chroma420_scale(
                planes[1], h_res, v_res, plan["up_h_cosited"],
                plan["up_v_cosited"], self.in_info.width,
                self.in_info.height, interpret=interpret)
            v = ck420.chroma420_scale(
                planes[2], h_res, v_res, plan["up_h_cosited"],
                plan["up_v_cosited"], self.in_info.width,
                self.in_info.height, interpret=interpret)
        chans = (None, y, u, v)

        pm = plan["matrix"]
        in_bits, out_bits = plan["unpack_bits"], plan["pack_bits"]
        if in_bits == 8 and out_bits == 16:
            chans = tuple(c if c is None else (c.astype(xp.int32) * 257)
                          for c in chans)
        chans = color_mod.apply_prepared_planes(xp, chans, pm)

        if plan["downsample"]:
            a, yy, uu, vv = chans
            if ofmt.h_sub[1] == 1:
                uu = chroma_mod.down2(xp, uu, -2, plan["down_v_cosited"])
                vv = chroma_mod.down2(xp, vv, -2, plan["down_v_cosited"])
            elif ofmt.h_sub[1] == 2:
                uu = chroma_mod.down4(xp, uu, -2, plan["down_v_cosited"])
                vv = chroma_mod.down4(xp, vv, -2, plan["down_v_cosited"])
            if ofmt.w_sub[1] == 1:
                uu = chroma_mod.down2(xp, uu, -1, plan["down_h_cosited"])
                vv = chroma_mod.down2(xp, vv, -1, plan["down_h_cosited"])
            elif ofmt.w_sub[1] == 2:
                uu = chroma_mod.down4(xp, uu, -1, plan["down_h_cosited"])
                vv = chroma_mod.down4(xp, vv, -1, plan["down_h_cosited"])
            chans = (a, yy, uu, vv)

        return self._finish(xp, chans)

    def _pallas_enabled(self) -> bool:
        # The fused ingest kernel is bit-exact (verified on TPU) but its
        # current schedule underperforms the XLA path (~0.75k vs 3.2k fps
        # at 1080p) and Mosaic compiles take minutes on this tunnel —
        # opt-in only until the schedule is tuned (GTPU_PALLAS=1 or
        # =interpret for CPU tests).
        import os

        mode = os.environ.get("GTPU_PALLAS", "0")
        if mode == "interpret":
            return True
        if mode == "1":
            import jax
            return jax.default_backend() == "tpu"
        return False

    def _pipeline_pallas(self, xp, planes):
        """Fused-ingest variant: Pallas kernel does unpack + chroma-up +
        h-scale, XLA finishes vscale + matrix + downsample + pack."""
        import os

        from ..ops.convert_kernel import fused_i420_up_hscale
        from .format import pack_planes

        ii, oi = self.in_info, self.out_info
        plan = self._plan
        interp = os.environ.get("GTPU_PALLAS") == "interpret"
        taps_m = scaler_mod.tap_matrix(plan["h_res"])
        y, u, v = planes[0], planes[1], planes[2]
        yk, ue, uo, ve, vo = fused_i420_up_hscale(
            y, u, v, taps_m, None,
            h_cosited=plan["up_h_cosited"], interpret=interp)
        if plan["v_res"] is not None:
            yk = scaler_mod.scale_axis_exact(xp, yk, -2, plan["v_res"])
            uk = scaler_mod.scale_rows_split_exact(xp, ue, uo, plan["v_res"])
            vk = scaler_mod.scale_rows_split_exact(xp, ve, vo, plan["v_res"])
        else:
            # interleave the parity planes (cheap at the scaled width)
            def _ilv(e, o):
                st = xp.stack([e, o], axis=-2)
                return st.reshape(e.shape[:-2] + (e.shape[-2] * 2,
                                                  e.shape[-1]))
            uk = _ilv(ue, uo)
            vk = _ilv(ve, vo)
        chans = (None, yk, uk, vk)
        chans = color_mod.apply_prepared_planes(xp, chans, plan["matrix"])
        ofmt = oi.finfo
        if plan["downsample"]:
            a, yy, uu, vv = chans
            if ofmt.h_sub[1] == 1:
                uu = chroma_mod.down2(xp, uu, -2, plan["down_v_cosited"])
                vv = chroma_mod.down2(xp, vv, -2, plan["down_v_cosited"])
            if ofmt.w_sub[1] == 1:
                uu = chroma_mod.down2(xp, uu, -1, plan["down_h_cosited"])
                vv = chroma_mod.down2(xp, vv, -1, plan["down_h_cosited"])
            chans = (a, yy, uu, vv)
        return self._finish(xp, chans)

    # numpy gold path
    def convert_ref(self, planes):
        return self._pipeline(np, tuple(np.asarray(p) for p in planes))

    # device path
    def convert(self, planes):
        import jax
        import jax.numpy as jnp

        d = self._plan["dither"]
        if d is not None and d.method in ("floyd-steinberg", "sierra-lite"):
            # serial error propagation cannot be traced — run the exact
            # numpy pipeline on the host (the reference's own comment at
            # video-orc.orc:2885 notes these defeat vectorization)
            return tuple(jnp.asarray(p) for p in self.convert_ref(
                tuple(np.asarray(p) for p in planes)))
        if self._jit_fn is None:
            self._jit_fn = jax.jit(lambda ps: self._pipeline(jnp, ps))
        return self._jit_fn(tuple(planes))

    def trace_fn(self):
        """The pure function (for composition into a pipeline program)."""
        import jax.numpy as jnp
        return lambda ps: self._pipeline(jnp, ps)
