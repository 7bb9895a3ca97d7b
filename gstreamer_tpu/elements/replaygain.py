"""ReplayGain elements: rganalysis / rgvolume / rglimiter.

References (gst-plugins-good/gst/replaygain/):
* gstrganalysis.c — passthrough analyzer: feeds samples to the
  RgAnalysisCtx, emits GST_TAG_TRACK_GAIN/TRACK_PEAK (+ ALBUM_* when
  `num-tracks` album processing completes) and REFERENCE_LEVEL on EOS.
* gstrgvolume.c — tag-driven gain: gain = (album|track) gain +
  pre-amp, limited so peak stays under `headroom` dB
  (gst_rg_volume_determine_gain :640-688); fallback-gain (+ pre-amp)
  when no tags.
* gstrglimiter.c:168-196 — stateless tanh soft-limiter above
  ±0.5 (-6 dB): out = tanh((x -/+ THRES)/COMPL)*COMPL +/- THRES,
  float32.

rganalysis is a host passthrough (sequential IIR state); rglimiter and
rgvolume's gain are pure device fns that fuse into the program.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from ..audio.info import AudioInfo
from ..audio.rganalysis import RgAnalysisCtx, RG_REFERENCE_LEVEL
from ..core.buffer import Buffer
from ..core.element import (PadDirection, PadTemplate, TransformElement,
                            register_element)

_ANALYSIS_CAPS = ("audio/x-raw, format={ F32LE, S16LE }, "
                  "rate={ 48000, 44100, 32000, 24000, 22050, 16000, "
                  "12000, 11025, 8000 }, channels=[1,2], "
                  "layout=interleaved")
_FLOAT_CAPS = ("audio/x-raw, format=F32LE, rate=[1,2147483647], "
               "channels=[1,64], layout=interleaved")


@register_element
class RgAnalysis(TransformElement):
    FACTORY = "rganalysis"
    DESCRIPTION = "Perform the ReplayGain analysis"
    HOST_ELEMENT = True
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, _ANALYSIS_CAPS),
        PadTemplate("src", PadDirection.SRC, _ANALYSIS_CAPS),
    ]
    PROPERTIES = {
        "num-tracks": (int, 0, "album mode: tracks remaining"),
        "forced": (bool, True, "analyze even if tags are present"),
        "reference-level": (float, RG_REFERENCE_LEVEL, "dB"),
    }

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._ctx = RgAnalysisCtx()
        self._tracks_left = self.props["num-tracks"]

    def start(self):
        self._ctx = RgAnalysisCtx()
        self._tracks_left = self.props["num-tracks"]

    def set_info(self, incaps, outcaps):
        self._info = AudioInfo.from_caps_structure(incaps[0])
        self._ctx.set_sample_rate(self._info.rate)

    def host_process(self, buf: Buffer) -> Optional[Buffer]:
        if self._ctx.sample_rate == 0:      # start() may follow set_info
            self._ctx.set_sample_rate(self._info.rate)
        x = np.asarray(buf.data)
        if x.dtype == np.int16:
            # int16 path scales by 1/32768 for peak, raw for analysis
            # (rg_analysis_analyze_stereo_int16 :602)
            xs = x.astype(np.float64) / 32768.0
        else:
            xs = x.astype(np.float64)
        self._ctx.analyze(xs)
        return buf

    def _post_tags(self, tags):
        root = self
        while getattr(root, "parent", None) is not None:
            root = root.parent
        if hasattr(root, "bus"):
            from ..core.pipeline import Message
            root.bus.post(Message("tag", self.name, tags))
        from ..core.events import tag_event
        for sp in self.src_pads():
            ev = tag_event(tags)
            if sp.peer is not None:
                sp.push_event(ev)
            else:
                sp.sticky[ev.type] = ev

    def sink_event(self, pad, event) -> bool:
        from ..core.events import EventType

        if event.type == EventType.EOS:
            res = self._ctx.track_result()
            if res is not None:
                gain, peak = res
                tags = {
                    "replaygain-track-gain": gain,
                    "replaygain-track-peak": peak,
                    "replaygain-reference-level":
                        self.props["reference-level"],
                }
                if self._tracks_left > 0:
                    self._tracks_left -= 1
                    if self._tracks_left == 0:
                        ares = self._ctx.album_result()
                        if ares is not None:
                            tags["replaygain-album-gain"] = ares[0]
                            tags["replaygain-album-peak"] = ares[1]
                self._post_tags(tags)
        return super().sink_event(pad, event)


@register_element
class RgVolume(TransformElement):
    FACTORY = "rgvolume"
    DESCRIPTION = "Apply ReplayGain volume adjustment"
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, _FLOAT_CAPS),
        PadTemplate("src", PadDirection.SRC, _FLOAT_CAPS),
    ]
    PROPERTIES = {
        "album-mode": (bool, True, "prefer album gain"),
        "headroom": (float, 0.0, "extra headroom (dB)"),
        "pre-amp": (float, 0.0, "extra gain (dB)"),
        "fallback-gain": (float, 0.0, "gain when no tags (dB)"),
    }

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._tags = {}
        self.target_gain = 0.0
        self.result_gain = 0.0

    def sink_event(self, pad, event) -> bool:
        from ..core.events import EventType

        if event.type == EventType.TAG:
            tags = event.data.get("tags") or {}
            self._tags.update({k: v for k, v in tags.items()
                               if k.startswith("replaygain-")})
        return super().sink_event(pad, event)

    def _determine_gain(self):
        """gst_rg_volume_determine_gain (gstrgvolume.c:640)."""
        t = self._tags
        has_tg = "replaygain-track-gain" in t
        has_ag = "replaygain-album-gain" in t
        album_mode = self.props["album-mode"]
        if not has_tg and not has_ag:
            gain, peak = self.props["fallback-gain"], 1.0
        elif (album_mode and has_ag) or (not album_mode and not has_tg):
            gain = t["replaygain-album-gain"]
            peak = t.get("replaygain-album-peak", 1.0)
        else:
            gain = t["replaygain-track-gain"]
            peak = t.get("replaygain-track-peak", 1.0)
        gain += self.props["pre-amp"]
        self.target_gain = self.result_gain = gain
        if peak > 0 and 20.0 * math.log10(peak) + gain \
                > self.props["headroom"]:
            self.result_gain = (20.0 * math.log10(1.0 / peak)
                                + self.props["headroom"])

    def set_info(self, incaps, outcaps):
        pass

    def make_fn(self):
        self._determine_gain()
        vol = 10.0 ** (self.result_gain / 20.0)
        if vol == 1.0:
            return None

        def fn(x):
            return (x * vol).astype(x.dtype)

        return fn


@register_element
class RgLimiter(TransformElement):
    """rglimiter (gstrglimiter.c): tanh soft-clip above -6 dB."""
    FACTORY = "rglimiter"
    DESCRIPTION = "Apply signal compression to raw audio data"
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, _FLOAT_CAPS),
        PadTemplate("src", PadDirection.SRC, _FLOAT_CAPS),
    ]
    PROPERTIES = {"enabled": (bool, True, "")}

    def set_info(self, incaps, outcaps):
        pass

    def make_fn(self):
        if not self.props["enabled"]:
            return None

        def fn(x):
            import jax.numpy as jnp
            thres, compl_ = jnp.float32(0.5), jnp.float32(0.5)
            xf = x.astype(jnp.float32)
            hi = jnp.tanh((xf - thres) / compl_) * compl_ + thres
            lo = jnp.tanh((xf + thres) / compl_) * compl_ - thres
            return jnp.where(xf > thres, hi,
                             jnp.where(xf < -thres, lo, xf)) \
                .astype(x.dtype)

        return fn
