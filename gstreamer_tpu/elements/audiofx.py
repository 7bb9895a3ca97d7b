"""Audio effects family + analysis elements.

References (gst-plugins-good/gst/audiofx/, gst-plugins-good/gst/
spectrum/, gst-plugins-good/gst/level/):
* audioecho — gstaudioecho.c: delayed feedback echo
  out = in + intensity * delayed
* audioamplify — gstaudioamplify.c: gain with clipping methods
* audioinvert — gstaudioinvert.c: out = (1-2*degree)*in  (degree 0..1)
* audiokaraoke — gstaudiokaraoke.c: center-channel cancellation
  out_l = l - r*level + mono_filtered (simplified: l - r*level)
* audiodynamic — compressor/expander with hard/soft knee
* spectrum — FFT magnitude messages per interval
* level — RMS/peak messages per interval

Stateless effects are pure device fns; echo keeps a delay-line history
(host-boundary element whose FIR still runs jitted).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..audio.fft import FFT, WINDOW_HANN, magnitude_db
from ..audio.info import AudioInfo
from ..core.buffer import Buffer
from ..core.caps import Caps
from ..core.element import (PadDirection, PadTemplate, TransformElement,
                            register_element)
from .audio_elements import AUDIO_CAPS, _native_dtype

FLOAT_CAPS = ("audio/x-raw, format={ F32LE, F64LE }, rate=[1,2147483647], "
              "channels=[1,64], layout=interleaved")


class _AudioFxBase(TransformElement):
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, AUDIO_CAPS),
        PadTemplate("src", PadDirection.SRC, AUDIO_CAPS),
    ]

    def set_info(self, incaps, outcaps):
        self._info = AudioInfo.from_caps_structure(incaps[0])

    def _limits(self):
        f = self._info.finfo
        if f.is_float:
            return None
        lim = 1 << (f.width - 1)
        return (-lim, lim - 1)


@register_element
class AudioAmplify(_AudioFxBase):
    FACTORY = "audioamplify"
    DESCRIPTION = "Amplifies audio with selectable clipping"
    PROPERTIES = {
        "amplification": (float, 1.0, "gain factor"),
        "clipping-method": (str, "clip", "clip|wrap-negative|wrap-positive|none"),
    }

    def make_fn(self):
        amp = self.props["amplification"]
        if amp == 1.0:
            return None
        method = self.props["clipping-method"]
        lim = self._limits()

        def fn(x):
            import jax.numpy as jnp
            if lim is None:
                v = x * amp
                if method == "clip":
                    v = jnp.clip(v, -1.0, 1.0)
                return v.astype(x.dtype)
            v = x.astype(jnp.float64) * amp
            if method == "clip":
                v = jnp.clip(v, lim[0], lim[1])
            elif method.startswith("wrap"):
                rng = lim[1] - lim[0] + 1
                v = ((v - lim[0]) % rng) + lim[0]
            return v.astype(x.dtype)

        return fn


@register_element
class AudioInvert(_AudioFxBase):
    FACTORY = "audioinvert"
    DESCRIPTION = "Swaps upper and lower half of audio samples"
    PROPERTIES = {"degree": (float, 0.0, "0..1")}

    def make_fn(self):
        d = self.props["degree"]
        if d == 0.0:
            return None
        factor = 1.0 - 2.0 * d

        def fn(x):
            import jax.numpy as jnp
            v = x.astype(jnp.float64) * factor
            lim = self._limits()
            if lim is not None:
                v = jnp.clip(v, lim[0], lim[1])
            return v.astype(x.dtype)

        return fn


@register_element
class AudioKaraoke(_AudioFxBase):
    FACTORY = "audiokaraoke"
    DESCRIPTION = "Removes the center channel (voice)"
    PROPERTIES = {
        "level": (float, 1.0, "cancellation level"),
        "mono-level": (float, 1.0, ""),
    }

    def make_fn(self):
        level = self.props["level"]

        def fn(x):
            import jax.numpy as jnp
            if x.shape[-1] < 2:
                return x
            l = x[..., 0].astype(jnp.float64)
            r = x[..., 1].astype(jnp.float64)
            out_l = l - r * level
            out_r = r - l * level
            lim = self._limits()
            if lim is not None:
                out_l = jnp.clip(out_l, lim[0], lim[1])
                out_r = jnp.clip(out_r, lim[0], lim[1])
            rest = [x[..., i].astype(jnp.float64)
                    for i in range(2, x.shape[-1])]
            return jnp.stack([out_l, out_r] + rest, axis=-1).astype(x.dtype)

        return fn


@register_element
class AudioEcho(_AudioFxBase):
    """audioecho: out = in + intensity * in[t - delay] with feedback."""
    FACTORY = "audioecho"
    DESCRIPTION = "Adds an echo to audio"
    HOST_ELEMENT = True
    PROPERTIES = {
        "delay": (int, 1, "delay in ns"),
        "intensity": (float, 0.0, "echo intensity 0..1"),
        "feedback": (float, 0.0, "feedback 0..1"),
    }

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._hist: Optional[np.ndarray] = None

    def start(self):
        self._hist = None

    def host_process(self, buf: Buffer) -> Optional[Buffer]:
        import jax.numpy as jnp

        info = self._info
        delay_samps = self.props["delay"] * info.rate // 1_000_000_000
        inten = self.props["intensity"]
        fb = self.props["feedback"]
        if delay_samps <= 0 or inten == 0.0:
            return buf
        x = np.asarray(buf.data).astype(np.float64)
        n = x.shape[0]
        if self._hist is None:
            self._hist = np.zeros((delay_samps,) + x.shape[1:], np.float64)
        # sequential feedback per delay block (vectorized inside a block)
        hist = self._hist
        out = np.empty_like(x)
        pos = 0
        while pos < n:
            m = min(delay_samps, n - pos)
            blk = x[pos:pos + m] + inten * hist[:m]
            out[pos:pos + m] = blk
            hist = np.concatenate([hist[m:],
                                   x[pos:pos + m] + fb * hist[:m]], axis=0)
            pos += m
        self._hist = hist
        lim = self._limits()
        if lim is not None:
            out = np.clip(out, lim[0], lim[1])
        return buf.with_(data=out.astype(np.asarray(buf.data).dtype))


@register_element
class AudioDynamic(_AudioFxBase):
    FACTORY = "audiodynamic"
    DESCRIPTION = "Compressor/expander"
    PROPERTIES = {
        "mode": (str, "compressor", "compressor|expander"),
        "characteristics": (str, "hard-knee", "hard-knee|soft-knee"),
        "threshold": (float, 0.0, "0..1"),
        "ratio": (float, 1.0, ""),
    }

    def make_fn(self):
        thr = self.props["threshold"]
        ratio = self.props["ratio"]
        mode = self.props["mode"]
        if ratio == 1.0:
            return None
        f = self._info.finfo
        lim = self._limits()
        scale = 1.0 if f.is_float else (lim[1] + 1)

        def fn(x):
            import jax.numpy as jnp
            v = x.astype(jnp.float64) / scale
            a = jnp.abs(v)
            if mode == "compressor":
                over = a > thr
                mag = jnp.where(over, thr + (a - thr) * ratio, a)
            else:
                under = a < thr
                mag = jnp.where(under, a * ratio, a)
            out = jnp.sign(v) * mag * scale
            if lim is not None:
                out = jnp.clip(out, lim[0], lim[1])
            return out.astype(x.dtype)

        return fn


@register_element
class Spectrum(_AudioFxBase):
    """spectrum: passthrough + magnitude messages on the bus."""
    FACTORY = "spectrum"
    DESCRIPTION = "FFT spectrum analyzer (posts magnitude messages)"
    HOST_ELEMENT = True
    PROPERTIES = {
        "bands": (int, 129, "number of frequency bands"),
        "post-messages": (bool, True, ""),
    }

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self.last_magnitudes = None

    def host_process(self, buf: Buffer) -> Optional[Buffer]:
        bands = self.props["bands"]
        nfft = 2 * (bands - 1)
        x = np.asarray(buf.data).astype(np.float64)
        f = self._info.finfo
        if not f.is_float:
            x = x / (1 << (f.width - 1))
        mono = x.mean(axis=-1)
        n = (len(mono) // nfft) * nfft
        if n:
            fft = FFT(nfft)
            spec = fft.fft(np, mono[:n].reshape(-1, nfft), win=WINDOW_HANN)
            self.last_magnitudes = np.asarray(
                magnitude_db(np, spec, nfft)).mean(axis=0)
            if self.props["post-messages"] and self.parent is not None:
                root = self.parent
                while getattr(root, "parent", None) is not None:
                    root = root.parent
                if hasattr(root, "bus"):
                    from ..core.pipeline import Message
                    root.bus.post(Message(
                        "element", self.name,
                        {"magnitude": self.last_magnitudes.tolist()}))
        return buf


@register_element
class Level(_AudioFxBase):
    """level: RMS/peak measurement messages."""
    FACTORY = "level"
    DESCRIPTION = "RMS/Peak level messages"
    HOST_ELEMENT = True
    PROPERTIES = {"post-messages": (bool, True, "")}

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self.last_rms = None
        self.last_peak = None

    def host_process(self, buf: Buffer) -> Optional[Buffer]:
        x = np.asarray(buf.data).astype(np.float64)
        f = self._info.finfo
        if not f.is_float:
            x = x / (1 << (f.width - 1))
        rms = np.sqrt((x ** 2).mean(axis=0))
        peak = np.abs(x).max(axis=0)
        self.last_rms = 20 * np.log10(np.maximum(rms, 1e-20))
        self.last_peak = 20 * np.log10(np.maximum(peak, 1e-20))
        if self.props["post-messages"] and self.parent is not None:
            root = self.parent
            while getattr(root, "parent", None) is not None:
                root = root.parent
            if hasattr(root, "bus"):
                from ..core.pipeline import Message
                root.bus.post(Message(
                    "element", self.name,
                    {"rms": self.last_rms.tolist(),
                     "peak": self.last_peak.tolist()}))
        return buf
