"""vorbisdec / vorbisenc / opusdec / opusenc — Xiph lossy audio codecs.

Reference: gst-plugins-base/ext/vorbis/gstvorbisdec.c:1 /
gstvorbisenc.c:1 and ext/opus/gstopusdec.c:1 / gstopusenc.c:1.

Decode side for Vorbis is the clean-room spec implementation in
codecs/vorbis.py (batched-matmul IMDCT); Vorbis analysis and the Opus
codec wrap the system libraries exactly as the reference elements do.

Collapsed pull/sink style following flacenc/flacdec (flac_elements.py):
encoders accumulate raw audio and write one Ogg file at EOS; decoders
are location-based sources streaming decoded F32 audio.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..audio.info import AudioInfo
from ..core.buffer import Buffer
from ..core.caps import Caps
from ..core.element import (PadDirection, PadTemplate, SinkElement,
                            SourceElement, register_element)

_RAW_SINK = ("audio/x-raw, format={ F32LE, S16LE }, "
             "rate=[1,655350], channels=[1,8], layout=interleaved")
_F32_SRC = ("audio/x-raw, format=F32LE, rate=[1,655350], "
            "channels=[1,8], layout=interleaved")


class _OggAudioDec(SourceElement):
    """Shared location-based decoder scaffold."""
    PROPERTIES = {
        "location": (str, "", "ogg file path"),
        "blocksize": (int, 4096, "frames per output buffer"),
    }

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._samples = None
        self._pos = 0

    def _decode(self, data: bytes):
        raise NotImplementedError

    def _load(self):
        if self._samples is not None:
            return
        with open(self.props["location"], "rb") as f:
            data = f.read()
        pcm, rate, ch = self._decode(data)
        self._samples = np.asarray(pcm, np.float32)
        self._ainfo = AudioInfo(format="F32LE", rate=rate, channels=ch)
        self._pos = 0

    def get_caps(self, filter=None):
        if self.props["location"]:
            try:
                self._load()
            except (OSError, ValueError, RuntimeError):
                return Caps.any()
        caps = (Caps([self._ainfo.to_caps_structure()])
                if self._samples is not None else Caps.any())
        if filter is not None and not caps.is_any:
            caps = caps.intersect(filter)
        return caps

    def start(self):
        self._load()
        self._pos = 0

    def create(self, n_frames: int) -> Optional[Buffer]:
        if self._pos >= len(self._samples):
            return None
        take = self.props["blocksize"]
        chunk = self._samples[self._pos:self._pos + take]
        rate = self._ainfo.rate
        pts = self._pos * 1_000_000_000 // rate
        self._pos += len(chunk)
        return Buffer(data=chunk, batch=1, pts=pts,
                      duration=len(chunk) * 1_000_000_000 // rate)


@register_element
class VorbisDec(_OggAudioDec):
    FACTORY = "vorbisdec"
    DESCRIPTION = "decode raw vorbis streams to float audio"
    PAD_TEMPLATES = [PadTemplate("src", PadDirection.SRC, _F32_SRC)]

    def _decode(self, data: bytes):
        from ..codecs import vorbis as pvorbis
        return pvorbis.decode_ogg(data)


@register_element
class OpusDec(_OggAudioDec):
    FACTORY = "opusdec"
    DESCRIPTION = "decode opus streams to float audio"
    PAD_TEMPLATES = [PadTemplate("src", PadDirection.SRC, _F32_SRC)]

    def _decode(self, data: bytes):
        from ..codecs import opus as popus
        return popus.decode_ogg(data)


class _OggAudioEnc(SinkElement):
    """Shared accumulate-and-write encoder scaffold."""

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._chunks: List[np.ndarray] = []
        self._info: Optional[AudioInfo] = None

    def set_info(self, incaps, outcaps):
        self._info = AudioInfo.from_caps_structure(incaps[0])

    def start(self):
        self._chunks = []

    def render(self, buf: Buffer) -> str:
        x = np.asarray(buf.data)
        if x.ndim == 1:
            x = x[:, None]
        self._chunks.append(x)
        return "ok"

    def _pcm_float(self) -> np.ndarray:
        pcm = np.concatenate(self._chunks, axis=0)
        if self._info.format == "S16LE":
            pcm = pcm.astype(np.float32) / 32768.0
        return np.asarray(pcm, np.float32)

    def _encode(self, pcm: np.ndarray) -> bytes:
        raise NotImplementedError

    def stop(self):
        if self._info is None or not self._chunks:
            return
        blob = self._encode(self._pcm_float())
        with open(self.props["location"], "wb") as f:
            f.write(blob)
        self._chunks = []


@register_element
class VorbisEnc(_OggAudioEnc):
    FACTORY = "vorbisenc"
    DESCRIPTION = "Encodes audio in Vorbis format (libvorbisenc)"
    PAD_TEMPLATES = [PadTemplate("sink", PadDirection.SINK, _RAW_SINK)]
    PROPERTIES = {
        "location": (str, "out.ogg", "output path"),
        "quality": (float, 0.4, "VBR quality -0.1 .. 1.0"),
    }

    def _encode(self, pcm: np.ndarray) -> bytes:
        from ..codecs import vorbis_enc
        return vorbis_enc.encode_ogg(pcm, self._info.rate,
                                     self.props["quality"])


@register_element
class OpusEnc(_OggAudioEnc):
    FACTORY = "opusenc"
    DESCRIPTION = "Encodes audio in Opus format (libopus)"
    PAD_TEMPLATES = [PadTemplate(
        "sink", PadDirection.SINK,
        "audio/x-raw, format={ F32LE, S16LE }, rate=48000, "
        "channels=[1,2], layout=interleaved")]
    PROPERTIES = {
        "location": (str, "out.opus", "output path"),
        "bitrate": (int, 64000, "target bitrate (bps)"),
    }

    def _encode(self, pcm: np.ndarray) -> bytes:
        from ..codecs import opus as popus
        return popus.encode_ogg(pcm, self._info.rate,
                                self.props["bitrate"])


@register_element
class TheoraDec(SourceElement):
    """theoradec (collapsed source like the audio decoders here):
    Ogg/Theora file in, raw planar video out.  Decode is the
    clean-room codecs/theora.py (bit-exact vs libtheoradec)."""
    FACTORY = "theoradec"
    DESCRIPTION = "decode raw theora streams to raw YUV video"
    PAD_TEMPLATES = [PadTemplate(
        "src", PadDirection.SRC,
        "video/x-raw, format={ I420, Y42B, Y444 }")]
    PROPERTIES = {"location": (str, "", "ogg file path")}

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._frames = None
        self._pos = 0

    def _load(self):
        if self._frames is not None:
            return
        from ..codecs.theora import decode_ogg
        with open(self.props["location"], "rb") as f:
            data = f.read()
        frames, fps, dims, dec = decode_ogg(data, with_info=True)
        self._frames = frames
        self._fmt = {0: "I420", 2: "Y42B", 3: "Y444"}[dec.pixel_fmt]
        self._dims = dims
        self._fps = fps
        self._pos = 0

    def get_caps(self, filter=None):
        if self.props["location"]:
            try:
                self._load()
            except (OSError, ValueError):
                return Caps.any()
        if self._frames is None:
            return Caps.any()
        from ..core.value import Fraction
        from ..core.structure import Structure
        w, h = self._dims
        n, d = self._fps
        caps = Caps([Structure("video/x-raw", {
            "format": self._fmt, "width": w, "height": h,
            "framerate": Fraction(n, d)})])
        if filter is not None:
            caps = caps.intersect(filter)
        return caps

    def start(self):
        self._load()
        self._pos = 0

    def create(self, n_frames: int):
        if self._pos >= len(self._frames):
            return None
        take = self._frames[self._pos:self._pos + n_frames]
        data = tuple(np.stack([f[c] for f in take])
                     for c in range(3))
        n, d = self._fps
        pts = (self._pos * 1_000_000_000 * d // n) if n else None
        dur = 1_000_000_000 * d // n if n else None
        self._pos += len(take)
        return Buffer(data=data, batch=len(take), pts=pts,
                      duration=dur)


@register_element
class TheoraEnc(SinkElement):
    """theoraenc (libtheoraenc-backed, exactly like the reference
    element): raw 4:2:0 video in, Ogg/Theora file out."""
    FACTORY = "theoraenc"
    DESCRIPTION = "encode raw YUV video into a theora stream"
    PAD_TEMPLATES = [PadTemplate(
        "sink", PadDirection.SINK, "video/x-raw, format=I420")]
    PROPERTIES = {
        "location": (str, "out.ogv", "output path"),
        "quality": (int, 48, "encoder quality 0..63"),
    }

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._frames = []
        self._info = None

    def set_info(self, incaps, outcaps):
        from ..video.info import VideoInfo
        self._info = VideoInfo.from_caps_structure(incaps[0])

    def start(self):
        self._frames = []

    def render(self, buf: Buffer) -> str:
        y, cb, cr = (np.asarray(p) for p in buf.data)
        if y.ndim == 2:
            y, cb, cr = y[None], cb[None], cr[None]
        for k in range(y.shape[0]):
            self._frames.append((y[k], cb[k], cr[k]))
        return "ok"

    def stop(self):
        if not self._frames or self._info is None:
            return
        from ..codecs.theora_enc import encode_ogg
        fps = self._info.fps
        blob = encode_ogg(self._frames, self._info.width,
                          self._info.height,
                          (fps.num, fps.denom) if fps and fps.num
                          else (30, 1),
                          quality=self.props["quality"])
        with open(self.props["location"], "wb") as f:
            f.write(blob)
        self._frames = []
