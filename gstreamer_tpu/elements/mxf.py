"""MXF (SMPTE 377M) — mxfmux / mxfdemux, reduced OP1a.

References: gst-plugins-bad/gst/mxf/ — mxfmux.c (partition/primer/
metadata/essence writing), mxfdemux.c (KLV walk, metadata resolve,
essence tracks), mxful.c (the SMPTE UL registry; the 16-byte keys
below are SMPTE-registered constants, not creative content),
mxfup.c (uncompressed picture mapping), mxfaes-bwf.c (BWF/AES PCM).

Reduced OP1a profile:
* single body partition layout: header partition (closed complete) +
  primer + structural metadata (Preface, Identification,
  ContentStorage, EssenceContainerData, Material/Source packages with
  timeline tracks, Sequence, SourceClip, CDCI picture descriptor and/
  or WAVE audio descriptor), frame-wrapped essence KLVs, footer
  partition + RIP;
* picture essence: UYVY 8-bit 4:2:2 via the CDCI descriptor
  (horizontal subsampling 2); sound essence: interleaved PCM S16LE
  via the WAVE descriptor;
* local tags are the SMPTE 377M static tags, declared in the primer.

The demuxer is a source-style element (location + stream selection,
like wavparse/avidemux) resolving caps from the descriptors.
"""

from __future__ import annotations

import struct
import uuid
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..audio import format as afmt
from ..audio.info import AudioInfo
from ..core.buffer import Buffer
from ..core.caps import Caps
from ..core.element import (AggregatorElement, PadDirection,
                            PadPresence, PadTemplate, SourceElement,
                            register_element)
from ..core.value import Fraction
from ..video.format import frame_size, from_bytes, to_bytes
from ..video.info import VideoInfo

# -- SMPTE ULs (mxful.c; SMPTE 377M / 379M / 378M) --------------------------

UL_PARTITION_PREFIX = bytes((0x06, 0x0E, 0x2B, 0x34, 0x02, 0x05,
                             0x01, 0x01, 0x0D, 0x01, 0x02, 0x01,
                             0x01))          # + kind, status, 0x00
UL_PRIMER = bytes((0x06, 0x0E, 0x2B, 0x34, 0x02, 0x05, 0x01, 0x01,
                   0x0D, 0x01, 0x02, 0x01, 0x01, 0x05, 0x01, 0x00))
UL_FILL = bytes((0x06, 0x0E, 0x2B, 0x34, 0x01, 0x01, 0x01, 0x01,
                 0x03, 0x01, 0x02, 0x10, 0x01, 0x00, 0x00, 0x00))
UL_RIP = bytes((0x06, 0x0E, 0x2B, 0x34, 0x02, 0x05, 0x01, 0x01,
                0x0D, 0x01, 0x02, 0x01, 0x01, 0x11, 0x01, 0x00))
UL_OP1A = bytes((0x06, 0x0E, 0x2B, 0x34, 0x04, 0x01, 0x01, 0x01,
                 0x0D, 0x01, 0x02, 0x01, 0x01, 0x01, 0x09, 0x00))


def _meta_ul(setid: int) -> bytes:
    """Structural metadata set key (377M: 06.0E.2B.34.02.53...)."""
    return bytes((0x06, 0x0E, 0x2B, 0x34, 0x02, 0x53, 0x01, 0x01,
                  0x0D, 0x01, 0x01, 0x01, 0x01, 0x01, setid, 0x00))


SET_PREFACE = 0x2F
SET_IDENTIFICATION = 0x30
SET_CONTENT_STORAGE = 0x18
SET_ESSENCE_CONTAINER_DATA = 0x23
SET_MATERIAL_PACKAGE = 0x36
SET_SOURCE_PACKAGE = 0x37
SET_TIMELINE_TRACK = 0x3B
SET_SEQUENCE = 0x0F
SET_SOURCE_CLIP = 0x11
SET_MULTIPLE_DESCRIPTOR = 0x44
SET_CDCI_DESCRIPTOR = 0x28
SET_WAVE_DESCRIPTOR = 0x48

# data definitions (SMPTE 331M/377M track data kinds)
DD_PICTURE = bytes((0x06, 0x0E, 0x2B, 0x34, 0x04, 0x01, 0x01, 0x01,
                    0x01, 0x03, 0x02, 0x02, 0x01, 0x00, 0x00, 0x00))
DD_SOUND = bytes((0x06, 0x0E, 0x2B, 0x34, 0x04, 0x01, 0x01, 0x01,
                  0x01, 0x03, 0x02, 0x02, 0x02, 0x00, 0x00, 0x00))
DD_TIMECODE = bytes((0x06, 0x0E, 0x2B, 0x34, 0x04, 0x01, 0x01, 0x01,
                     0x01, 0x03, 0x02, 0x01, 0x01, 0x00, 0x00, 0x00))

# generic container essence element key prefix (379M 7.1)
ESSENCE_PREFIX = bytes((0x06, 0x0E, 0x2B, 0x34, 0x01, 0x02, 0x01,
                        0x01, 0x0D, 0x01, 0x03, 0x01))
TRACKNUM_PICTURE = 0x15010500        # CP picture, uncompressed
TRACKNUM_SOUND = 0x16010100          # CP sound, wave PCM

# essence container labels (379M/382M/384M family)
ECL_UNC_PICTURE = bytes((0x06, 0x0E, 0x2B, 0x34, 0x04, 0x01, 0x01,
                         0x01, 0x0D, 0x01, 0x03, 0x01, 0x02, 0x05,
                         0x01, 0x01))
ECL_BWF = bytes((0x06, 0x0E, 0x2B, 0x34, 0x04, 0x01, 0x01, 0x01,
                 0x0D, 0x01, 0x03, 0x01, 0x02, 0x06, 0x01, 0x00))

# picture/sound essence coding labels
PEC_UNC = bytes((0x06, 0x0E, 0x2B, 0x34, 0x04, 0x01, 0x01, 0x01,
                 0x04, 0x01, 0x02, 0x01, 0x7F, 0x00, 0x00, 0x00))
SEC_PCM = bytes((0x06, 0x0E, 0x2B, 0x34, 0x04, 0x01, 0x01, 0x01,
                 0x04, 0x02, 0x02, 0x01, 0x00, 0x00, 0x00, 0x00))


def ber(n: int) -> bytes:
    """BER long-form length (mxfmux writes 4-byte long form)."""
    return bytes((0x83,)) + n.to_bytes(3, "big")


def read_ber(data: bytes, pos: int) -> Tuple[int, int]:
    b0 = data[pos]
    if b0 < 0x80:
        return b0, pos + 1
    n = b0 & 0x7F
    return int.from_bytes(data[pos + 1:pos + 1 + n], "big"), \
        pos + 1 + n


def klv(key: bytes, value: bytes) -> bytes:
    return key + ber(len(value)) + value


def _umid(material: bytes) -> bytes:
    """SMPTE 330M basic UMID wrapping a 16-byte unique material id."""
    prefix = bytes((0x06, 0x0A, 0x2B, 0x34, 0x01, 0x01, 0x01, 0x05,
                    0x01, 0x01, 0x0D, 0x00, 0x13, 0x00, 0x00, 0x00))
    return prefix + material


def _local(tag: int, value: bytes) -> bytes:
    return struct.pack(">HH", tag, len(value)) + value


def _uuid() -> bytes:
    return uuid.uuid4().bytes


def _batch(uls: List[bytes]) -> bytes:
    return struct.pack(">II", len(uls), 16) + b"".join(uls)


# static local tags (SMPTE 377M) used by both ends
TAG_INSTANCE_UID = 0x3C0A
TAG_CONTENT_STORAGE = 0x3B03
TAG_OPERATIONAL_PATTERN = 0x3B09
TAG_ESSENCE_CONTAINERS = 0x3B0A
TAG_VERSION = 0x3B05
TAG_PACKAGES = 0x1901
TAG_ESSENCE_DATA = 0x1902
TAG_PACKAGE_UID = 0x4401
TAG_TRACKS = 0x4403
TAG_DESCRIPTOR = 0x4701
TAG_TRACK_ID = 0x4801
TAG_TRACK_NUMBER = 0x4804
TAG_EDIT_RATE = 0x4B01
TAG_ORIGIN = 0x4B02
TAG_SEQUENCE = 0x4803
TAG_DATA_DEFINITION = 0x0201
TAG_DURATION = 0x0202
TAG_STRUCTURAL_COMPONENTS = 0x1001
TAG_START_POSITION = 0x1201
TAG_SOURCE_PACKAGE_ID = 0x1101
TAG_SOURCE_TRACK_ID = 0x1102
TAG_LINKED_TRACK_ID = 0x3006
TAG_SAMPLE_RATE = 0x3001
TAG_CONTAINER_DURATION = 0x3002
TAG_ESSENCE_CONTAINER = 0x3004
TAG_STORED_HEIGHT = 0x3202
TAG_STORED_WIDTH = 0x3203
TAG_ASPECT_RATIO = 0x320E
TAG_FRAME_LAYOUT = 0x320C
TAG_PICTURE_CODING = 0x3201
TAG_H_SUBSAMPLING = 0x3302
TAG_V_SUBSAMPLING = 0x3308
TAG_AUDIO_RATE = 0x3D03
TAG_CHANNEL_COUNT = 0x3D07
TAG_QUANT_BITS = 0x3D01
TAG_BLOCK_ALIGN = 0x3D0A
TAG_AVG_BPS = 0x3D09
TAG_SUB_DESCRIPTORS = 0x3F01
TAG_LINKED_PACKAGE_UID = 0x2701
TAG_INDEX_SID = 0x3F06
TAG_BODY_SID = 0x3F07


def _partition_pack(kind: int, status: int, this_off: int,
                    footer_off: int, header_bytes: int,
                    body_sid: int, op: bytes,
                    containers: List[bytes]) -> bytes:
    """kind: 2 header / 4 footer; status: 4 = closed complete."""
    key = UL_PARTITION_PREFIX + bytes((kind, status, 0x00))
    v = struct.pack(">HHIQQ", 1, 2, 1, this_off, 0)   # ver, kag, this, prev
    v += struct.pack(">Q", footer_off)
    v += struct.pack(">QQ", header_bytes, 0)          # header, index bytes
    v += struct.pack(">IQI", 0, 0, body_sid)          # indexSID, bodyOff
    v += op
    v += _batch(containers)
    return klv(key, v)


# ---------------------------------------------------------------------------
# mxfmux
# ---------------------------------------------------------------------------

@register_element
class MxfMux(AggregatorElement):
    FACTORY = "mxfmux"
    DESCRIPTION = "Muxes video/audio streams into a MXF stream"
    HOST_ELEMENT = True
    PAD_TEMPLATES = [
        PadTemplate("video_%u", PadDirection.SINK,
                    "video/x-raw, format=UYVY",
                    presence=PadPresence.REQUEST),
        PadTemplate("audio_%u", PadDirection.SINK,
                    "audio/x-raw, format=S16LE, layout=interleaved",
                    presence=PadPresence.REQUEST),
        PadTemplate("src", PadDirection.SRC,
                    "application/mxf"),
    ]
    PROPERTIES = {"location": (str, "out.mxf", "output path")}

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._vinfo: Optional[VideoInfo] = None
        self._ainfo: Optional[AudioInfo] = None
        self._file = None
        self._vframes = 0
        self._asamples = 0

    def negotiate_output(self, in_caps, allowed):
        for pad_name, caps in in_caps.items():
            s = caps.fixate()[0]
            if pad_name.startswith("video"):
                self._vinfo = VideoInfo.from_caps_structure(s)
            else:
                self._ainfo = AudioInfo.from_caps_structure(s)
        return Caps.from_string("application/mxf")

    def _containers(self) -> List[bytes]:
        out = []
        if self._vinfo is not None:
            out.append(ECL_UNC_PICTURE)
        if self._ainfo is not None:
            out.append(ECL_BWF)
        return out

    def _edit_rate(self) -> Tuple[int, int]:
        if self._vinfo is not None:
            fps = self._vinfo.fps
            return fps.num, fps.denom
        return self._ainfo.rate, 1

    def _track_descs(self):
        """[(track_id, track_number, data_def)] for essence tracks."""
        out = []
        tid = 2                        # 1 reserved for timecode-ish
        if self._vinfo is not None:
            out.append((tid, TRACKNUM_PICTURE, DD_PICTURE))
            tid += 1
        if self._ainfo is not None:
            out.append((tid, TRACKNUM_SOUND, DD_SOUND))
        return out

    def _metadata(self, duration: int) -> bytes:
        er_n, er_d = self._edit_rate()
        material_uid = _umid(_uuid())
        source_uid = _umid(_uuid())
        sets: List[bytes] = []
        uid_preface = _uuid()
        uid_cstore = _uuid()
        uid_ecd = _uuid()
        uid_mp = _uuid()
        uid_sp = _uuid()
        tracks = self._track_descs()
        # per track: (mp_track, mp_seq, mp_clip, sp_track, sp_seq,
        #             sp_clip) uids
        tuids = [[_uuid() for _ in range(6)] for _ in tracks]
        uid_desc = _uuid()
        uid_subdescs = [_uuid() for _ in tracks]

        def track_set(uid, seq_uid, tid, tnum):
            v = _local(TAG_INSTANCE_UID, uid)
            v += _local(TAG_TRACK_ID, struct.pack(">I", tid))
            v += _local(TAG_TRACK_NUMBER, struct.pack(">I", tnum))
            v += _local(TAG_EDIT_RATE, struct.pack(">II", er_n, er_d))
            v += _local(TAG_ORIGIN, struct.pack(">q", 0))
            v += _local(TAG_SEQUENCE, seq_uid)
            return klv(_meta_ul(SET_TIMELINE_TRACK), v)

        def seq_set(uid, clip_uid, dd):
            v = _local(TAG_INSTANCE_UID, uid)
            v += _local(TAG_DATA_DEFINITION, dd)
            v += _local(TAG_DURATION, struct.pack(">q", duration))
            v += _local(TAG_STRUCTURAL_COMPONENTS,
                        _batch([clip_uid]))
            return klv(_meta_ul(SET_SEQUENCE), v)

        def clip_set(uid, dd, src_pkg, src_tid):
            v = _local(TAG_INSTANCE_UID, uid)
            v += _local(TAG_DATA_DEFINITION, dd)
            v += _local(TAG_DURATION, struct.pack(">q", duration))
            v += _local(TAG_START_POSITION, struct.pack(">q", 0))
            v += _local(TAG_SOURCE_PACKAGE_ID, src_pkg)
            v += _local(TAG_SOURCE_TRACK_ID,
                        struct.pack(">I", src_tid))
            return klv(_meta_ul(SET_SOURCE_CLIP), v)

        # preface
        v = _local(TAG_INSTANCE_UID, uid_preface)
        v += _local(TAG_VERSION, struct.pack(">H", 0x0102))
        v += _local(TAG_CONTENT_STORAGE, uid_cstore)
        v += _local(TAG_OPERATIONAL_PATTERN, UL_OP1A)
        v += _local(TAG_ESSENCE_CONTAINERS,
                    _batch(self._containers()))
        sets.append(klv(_meta_ul(SET_PREFACE), v))
        # content storage
        v = _local(TAG_INSTANCE_UID, uid_cstore)
        v += _local(TAG_PACKAGES, _batch([uid_mp, uid_sp]))
        v += _local(TAG_ESSENCE_DATA, _batch([uid_ecd]))
        sets.append(klv(_meta_ul(SET_CONTENT_STORAGE), v))
        # essence container data
        v = _local(TAG_INSTANCE_UID, uid_ecd)
        v += _local(TAG_LINKED_PACKAGE_UID, source_uid)
        v += _local(TAG_INDEX_SID, struct.pack(">I", 0))
        v += _local(TAG_BODY_SID, struct.pack(">I", 1))
        sets.append(klv(_meta_ul(SET_ESSENCE_CONTAINER_DATA), v))
        # material package
        v = _local(TAG_INSTANCE_UID, uid_mp)
        v += _local(TAG_PACKAGE_UID, material_uid)
        v += _local(TAG_TRACKS, _batch([t[0] for t in tuids]))
        sets.append(klv(_meta_ul(SET_MATERIAL_PACKAGE), v))
        for (tid, tnum, dd), uids in zip(tracks, tuids):
            sets.append(track_set(uids[0], uids[1], tid, 0))
            sets.append(seq_set(uids[1], uids[2], dd))
            sets.append(clip_set(uids[2], dd, source_uid, tid))
        # source package
        v = _local(TAG_INSTANCE_UID, uid_sp)
        v += _local(TAG_PACKAGE_UID, source_uid)
        v += _local(TAG_TRACKS, _batch([t[3] for t in tuids]))
        v += _local(TAG_DESCRIPTOR, uid_desc)
        sets.append(klv(_meta_ul(SET_SOURCE_PACKAGE), v))
        for (tid, tnum, dd), uids in zip(tracks, tuids):
            sets.append(track_set(uids[3], uids[4], tid, tnum))
            sets.append(seq_set(uids[4], uids[5], dd))
            sets.append(clip_set(uids[5], dd, b"\x00" * 32, 0))
        # descriptors
        sub = []
        for (tid, tnum, dd), sub_uid in zip(tracks, uid_subdescs):
            if dd == DD_PICTURE:
                vi = self._vinfo
                d = _local(TAG_INSTANCE_UID, sub_uid)
                d += _local(TAG_LINKED_TRACK_ID,
                            struct.pack(">I", tid))
                d += _local(TAG_SAMPLE_RATE,
                            struct.pack(">II", er_n, er_d))
                d += _local(TAG_ESSENCE_CONTAINER, ECL_UNC_PICTURE)
                d += _local(TAG_STORED_WIDTH,
                            struct.pack(">I", vi.width))
                d += _local(TAG_STORED_HEIGHT,
                            struct.pack(">I", vi.height))
                d += _local(TAG_FRAME_LAYOUT, b"\x00")   # full frame
                d += _local(TAG_ASPECT_RATIO,
                            struct.pack(">II", vi.width, vi.height))
                d += _local(TAG_PICTURE_CODING, PEC_UNC)
                d += _local(TAG_H_SUBSAMPLING,
                            struct.pack(">I", 2))
                d += _local(TAG_V_SUBSAMPLING,
                            struct.pack(">I", 1))
                sets.append(klv(_meta_ul(SET_CDCI_DESCRIPTOR), d))
            else:
                ai = self._ainfo
                d = _local(TAG_INSTANCE_UID, sub_uid)
                d += _local(TAG_LINKED_TRACK_ID,
                            struct.pack(">I", tid))
                d += _local(TAG_SAMPLE_RATE,
                            struct.pack(">II", er_n, er_d))
                d += _local(TAG_ESSENCE_CONTAINER, ECL_BWF)
                d += _local(TAG_AUDIO_RATE,
                            struct.pack(">II", ai.rate, 1))
                d += _local(TAG_CHANNEL_COUNT,
                            struct.pack(">I", ai.channels))
                d += _local(TAG_QUANT_BITS, struct.pack(">I", 16))
                d += _local(TAG_BLOCK_ALIGN,
                            struct.pack(">H", 2 * ai.channels))
                d += _local(TAG_AVG_BPS, struct.pack(
                    ">I", ai.rate * 2 * ai.channels))
                sets.append(klv(_meta_ul(SET_WAVE_DESCRIPTOR), d))
            sub.append(sub_uid)
        # multiple descriptor glue (one essence type keeps a direct
        # descriptor in real muxers; we always use the wrapper)
        v = _local(TAG_INSTANCE_UID, uid_desc)
        v += _local(TAG_SAMPLE_RATE, struct.pack(">II", er_n, er_d))
        v += _local(TAG_SUB_DESCRIPTORS, _batch(sub))
        sets.append(klv(_meta_ul(SET_MULTIPLE_DESCRIPTOR), v))
        return b"".join(sets)

    def start(self):
        self._file = open(self.props["location"], "wb")
        self._vframes = 0
        self._asamples = 0
        self._essence: List[Tuple[int, bytes]] = []

    def host_aggregate(self, ins: Dict[str, Buffer]) -> Optional[Buffer]:
        for pad_name in sorted(ins):
            buf = ins[pad_name]
            if pad_name.startswith("video"):
                vi = self._vinfo
                raw = to_bytes(vi.finfo,
                               tuple(np.asarray(p) for p in buf.data),
                               vi.width, vi.height)
                raw = raw.reshape(buf.batch, -1)
                for k in range(buf.batch):
                    self._essence.append((TRACKNUM_PICTURE,
                                          raw[k].tobytes()))
                    self._vframes += 1
            else:
                samples = np.asarray(buf.data)
                raw = afmt.to_bytes(self._ainfo.finfo, samples)
                self._essence.append((TRACKNUM_SOUND, raw.tobytes()))
                self._asamples += samples.shape[0]
        first = next(iter(ins.values()))
        return first.with_(data=np.zeros(1, np.uint8))

    def stop(self):
        if self._file is None:
            return
        duration = self._vframes or self._asamples
        meta = self._metadata(duration)
        containers = self._containers()
        hdr = _partition_pack(0x02, 0x04, 0, 0, 0, 1, UL_OP1A,
                              containers)
        header_bytes = len(meta)
        hdr = _partition_pack(0x02, 0x04, 0, 0, header_bytes, 1,
                              UL_OP1A, containers)
        body = bytearray()
        for tnum, payload in self._essence:
            key = ESSENCE_PREFIX + struct.pack(">I", tnum)
            body += klv(key, payload)
        footer_off = len(hdr) + len(meta) + len(body)
        hdr = _partition_pack(0x02, 0x04, 0, footer_off, header_bytes,
                              1, UL_OP1A, containers)
        footer = _partition_pack(0x04, 0x04, footer_off, footer_off,
                                 0, 0, UL_OP1A, containers)
        rip_body = struct.pack(">IQ", 1, 0) \
            + struct.pack(">IQ", 0, footer_off)
        rip_body += struct.pack(">I", 16 + 4 + len(rip_body) + 4)
        rip = klv(UL_RIP, rip_body)
        self._file.write(hdr)
        self._file.write(meta)
        self._file.write(bytes(body))
        self._file.write(footer)
        self._file.write(rip)
        self._file.close()
        self._file = None


# ---------------------------------------------------------------------------
# mxfdemux
# ---------------------------------------------------------------------------

def _parse_mxf(path: str):
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    descriptors = []
    tracks: Dict[int, List[bytes]] = {}
    edit_rate = (25, 1)
    while pos + 17 <= len(data):
        key = data[pos:pos + 16]
        length, vpos = read_ber(data, pos + 16)
        value = data[vpos:vpos + length]
        if key[:12] == ESSENCE_PREFIX:
            tnum = struct.unpack(">I", key[12:16])[0]
            tracks.setdefault(tnum, []).append(value)
        elif key[:14] == _meta_ul(SET_CDCI_DESCRIPTOR)[:14] \
                and key[14] == SET_CDCI_DESCRIPTOR:
            d = _parse_locals(value)
            descriptors.append(("video", d))
        elif key[:14] == _meta_ul(SET_WAVE_DESCRIPTOR)[:14] \
                and key[14] == SET_WAVE_DESCRIPTOR:
            d = _parse_locals(value)
            descriptors.append(("audio", d))
        pos = vpos + length
    return descriptors, tracks


def _parse_locals(value: bytes) -> Dict[int, bytes]:
    out = {}
    pos = 0
    while pos + 4 <= len(value):
        tag, ln = struct.unpack(">HH", value[pos:pos + 4])
        out[tag] = value[pos + 4:pos + 4 + ln]
        pos += 4 + ln
    return out


@register_element
class MxfDemux(SourceElement):
    FACTORY = "mxfdemux"
    DESCRIPTION = "Demux MXF files"
    PAD_TEMPLATES = [PadTemplate("src", PadDirection.SRC, Caps.any())]
    PROPERTIES = {
        "location": (str, "", "mxf file path"),
        "stream": (str, "video", "video | audio"),
    }

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._loaded = False
        self._pos = 0

    def _load(self):
        if self._loaded:
            return
        descriptors, tracks = _parse_mxf(self.props["location"])
        sel = self.props["stream"]
        self._desc = None
        for kind, d in descriptors:
            if kind == sel:
                self._desc = d
                break
        if self._desc is None:
            raise ValueError(f"mxfdemux: no {sel!r} stream")
        tnum = (TRACKNUM_PICTURE if sel == "video"
                else TRACKNUM_SOUND)
        self._frames = tracks.get(tnum, [])
        d = self._desc
        if sel == "video":
            w = struct.unpack(">I", d[TAG_STORED_WIDTH])[0]
            h = struct.unpack(">I", d[TAG_STORED_HEIGHT])[0]
            n, den = struct.unpack(">II", d[TAG_SAMPLE_RATE])
            self._info = VideoInfo(format="UYVY", width=w, height=h,
                                   fps=Fraction(n, den))
        else:
            rate = struct.unpack(">II", d[TAG_AUDIO_RATE])[0]
            ch = struct.unpack(">I", d[TAG_CHANNEL_COUNT])[0]
            self._info = AudioInfo(format="S16LE", rate=rate,
                                   channels=ch)
        self._loaded = True

    def get_caps(self, filter=None):
        if self.props["location"]:
            try:
                self._load()
            except (OSError, ValueError, KeyError):
                return Caps.any()
        caps = Caps([self._info.to_caps_structure()]) if self._loaded \
            else Caps.any()
        if filter is not None and not caps.is_any:
            caps = caps.intersect(filter)
        return caps

    def set_info(self, incaps, outcaps):
        pass

    def start(self):
        self._load()
        self._pos = 0

    def create(self, n_frames: int) -> Optional[Buffer]:
        if self._pos >= len(self._frames):
            return None
        info = self._info
        if isinstance(info, VideoInfo):
            take = self._frames[self._pos:
                                self._pos + max(1, n_frames)]
            raws = np.stack([np.frombuffer(f, np.uint8)
                             for f in take])
            planes = from_bytes(info.finfo, raws, info.width,
                                info.height)
            fps = info.fps
            pts = self._pos * 1_000_000_000 * fps.denom // fps.num
            dur = 1_000_000_000 * fps.denom // fps.num
            self._pos += len(take)
            return Buffer(data=planes, pts=pts, duration=dur,
                          batch=len(take))
        raw = self._frames[self._pos]
        self._pos += 1
        samples = afmt.from_bytes(
            info.finfo, np.frombuffer(raw, np.uint8), info.channels)
        return Buffer(data=samples, batch=1,
                      duration=samples.shape[0] * 1_000_000_000
                      // info.rate)
