"""removesilence — VAD-driven silence removal.

Port of gst-plugins-bad/gst/removesilence/:
* vad_private.c — Q16 exponential power tracker updated per sample:
  p' = 0x0800*((s*s>>14)&0xFFFF) + 0xF7FF*(p>>16)
       + (0xF7FF*(p&0xFFFF))>>16       (vad_private.c:124-127)
  zero-crossing score over the last 256 samples (+1 per sign change,
  -1 otherwise, :135-144), frame = VOICE iff power > threshold and
  zcr < 0; voice->silence transitions deferred until `hysteresis`
  samples accumulate (:149-163).  threshold(dB) -> power via
  10^(int(dB/10)) * 2^32-1 (vad_set_threshold :105-109).
* gstremovesilence.c — with remove=true, silent buffers past the
  minimum-silence-buffers/-time guards are dropped; squash=true
  shortens the output timeline by the removed duration, otherwise the
  gap remains as missing time; "removesilence" bus messages carry
  silence_detected / silence_finished timestamps.

The per-sample recursion runs as one jitted lax.scan over the buffer
(exact uint64 emulation), cached per buffer length.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..audio.info import AudioInfo
from ..core.buffer import Buffer
from ..core.element import (PadDirection, PadTemplate, TransformElement,
                            register_element)

_ALPHA = 0x0800
_NALPHA = 0xFFFF - _ALPHA
_VAD_BUFFER = 256

_CAPS = ("audio/x-raw, format=S16LE, rate=[1,2147483647], channels=1, "
         "layout=interleaved")


class Vad:
    """Exact VADFilter state machine (vad_private.c)."""

    SILENCE, VOICE = 0, 1

    def __init__(self, hysteresis: int, threshold_db: int):
        self.hysteresis = hysteresis
        self.set_threshold(threshold_db)
        self.reset()
        self._scan_cache = {}

    def reset(self):
        self.power = 0
        self.state = self.SILENCE
        self.samples = 0
        self.ring = np.zeros(_VAD_BUFFER, np.int16)
        self.head = 0
        self.filled = 0

    def set_threshold(self, threshold_db: int):
        power = int(threshold_db / 10.0)
        self.threshold = int((10.0 ** power) * 4294967295)

    def _power_fn(self, n: int):
        if n not in self._scan_cache:
            import jax
            import jax.numpy as jnp
            from jax import lax

            def step(p, u):
                p = (jnp.uint64(_ALPHA) * u
                     + jnp.uint64(_NALPHA) * (p >> 16)
                     + ((jnp.uint64(_NALPHA) * (p & 0xFFFF)) >> 16))
                return p, None

            self._scan_cache[n] = jax.jit(
                lambda p0, u: lax.scan(step, p0, u)[0])
        return self._scan_cache[n]

    def update(self, data: np.ndarray) -> int:
        data = np.asarray(data, np.int16).ravel()
        n = len(data)
        if n == 0:
            return self.state
        # power recursion (exact uint64, jitted scan)
        d32 = data.astype(np.int32)
        u = ((d32 * d32) >> 14).astype(np.uint64) & 0xFFFF
        import jax.numpy as jnp
        self.power = int(self._power_fn(n)(jnp.uint64(self.power),
                                           jnp.asarray(u)))
        # ring buffer of the last 256 samples
        take = data[-_VAD_BUFFER:]
        for s in (take,):
            m = len(s)
            idx = (self.head + np.arange(m)) % _VAD_BUFFER
            self.ring[idx] = s
            self.head = (self.head + m) % _VAD_BUFFER
            self.filled = min(self.filled + m, _VAD_BUFFER)
        # zcr over ring in insertion order, tail..head (vad_private.c:
        # the queue holds size-1 usable entries once full)
        if self.filled >= _VAD_BUFFER:
            order = (self.head + np.arange(_VAD_BUFFER)) % _VAD_BUFFER
        else:
            order = np.arange(self.filled)
        seq = self.ring[order]
        if len(seq) >= 2:
            signs = (seq.astype(np.uint16) & 0x8000)
            zcr = int(np.where(signs[:-1] != signs[1:], 1, -1).sum())
        else:
            zcr = 0
        frame = (self.VOICE if (self.power > self.threshold and zcr < 0)
                 else self.SILENCE)
        if self.state != frame:
            if self.state == self.VOICE:
                self.samples += n
                if self.samples >= self.hysteresis:
                    self.state = frame
                    self.samples = 0
            else:
                self.state = frame
                self.samples = 0
        else:
            self.samples = 0
        return self.state


@register_element
class RemoveSilence(TransformElement):
    FACTORY = "removesilence"
    DESCRIPTION = "Removes all the silence periods from the audio stream"
    HOST_ELEMENT = True
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, _CAPS),
        PadTemplate("src", PadDirection.SRC, _CAPS),
    ]
    PROPERTIES = {
        "remove": (bool, False, "drop silent buffers"),
        "hysteresis": (int, 480, "voice->silence delay (samples)"),
        "threshold": (int, -60, "power threshold (dB)"),
        "squash": (bool, False, "compact the timeline"),
        "silent": (bool, True, "no bus messages"),
        "minimum-silence-buffers": (int, 0, "guard before dropping"),
        "minimum-silence-time": (int, 0, "guard ns before dropping"),
    }

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._vad = Vad(self.props["hysteresis"],
                        self.props["threshold"])
        self._consec = 0
        self._consec_ns = 0
        self._ts_offset = 0
        self._was_silence = False

    def start(self):
        self._vad = Vad(self.props["hysteresis"],
                        self.props["threshold"])
        self._consec = 0
        self._consec_ns = 0
        self._ts_offset = 0
        self._was_silence = False

    def set_info(self, incaps, outcaps):
        self._info = AudioInfo.from_caps_structure(incaps[0])

    def _post(self, key: str, ts):
        if self.props["silent"]:
            return
        root = self
        while getattr(root, "parent", None) is not None:
            root = root.parent
        if hasattr(root, "bus"):
            from ..core.pipeline import Message
            root.bus.post(Message("element", self.name, {
                "name": "removesilence", key: ts}))

    def host_process(self, buf: Buffer) -> Optional[Buffer]:
        x = np.asarray(buf.data)
        state = self._vad.update(x)
        silence = state == Vad.SILENCE
        dur = (len(x) * 1_000_000_000 // self._info.rate
               if buf.duration is None else buf.duration)
        if silence and not self._was_silence:
            self._post("silence_detected", buf.pts)
        elif not silence and self._was_silence:
            self._post("silence_finished", buf.pts)
            self._consec = 0
            self._consec_ns = 0
        self._was_silence = silence

        if silence and self.props["remove"]:
            self._consec += 1
            self._consec_ns += dur
            if (self._consec > self.props["minimum-silence-buffers"]
                    and self._consec_ns
                    >= self.props["minimum-silence-time"]):
                if self.props["squash"]:
                    self._ts_offset += dur
                return None                      # dropped
        if self._ts_offset and buf.pts is not None:
            return buf.with_(pts=buf.pts - self._ts_offset)
        return buf
