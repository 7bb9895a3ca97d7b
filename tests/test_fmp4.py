"""Fragmented MP4 (CMAF/DASH-style moof/trun movies) read support
(ISO 14496-12 §8.8; qtdemux.c gst_qtdemux_parse_moof)."""

import struct

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.isomp4 import _box, _full
from gstreamer_tpu.native import av as native_av

needs_av = pytest.mark.skipif(not native_av.available(),
                              reason="libavcodec shim unavailable")


def _build_fmp4(path, samples, avcc, groups=2):
    entry = (b"\0" * 6 + struct.pack(">H", 1)
             + struct.pack(">HH4sIIHH", 0, 0, b"\0\0\0\0", 0, 0,
                           64, 48)
             + struct.pack(">IIIHB", 0x00480000, 0x00480000, 0, 1, 0)
             + b"\0" * 31 + struct.pack(">Hh", 24, -1)
             + _box(b"avcC", avcc))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1)
                 + _box(b"avc1", entry))
    stbl = _box(b"stbl", stsd
                + _full(b"stts", 0, 0, struct.pack(">I", 0))
                + _full(b"stsc", 0, 0, struct.pack(">I", 0))
                + _full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
                + _full(b"stco", 0, 0, struct.pack(">I", 0)))
    mdhd = _full(b"mdhd", 0, 0,
                 struct.pack(">IIIIHH", 0, 0, 30, 0, 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, b"\0" * 4 + b"vide" + b"\0" * 13)
    mdia = _box(b"mdia", mdhd + hdlr + _box(b"minf", stbl))
    tkhd = _full(b"tkhd", 0, 3, struct.pack(">IIII", 0, 0, 1, 0)
                 + b"\0" * 12 + b"\0" * 36
                 + struct.pack(">II", 64 << 16, 48 << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvex = _box(b"mvex", _full(
        b"trex", 0, 0, struct.pack(">IIIII", 1, 1, 1, 0, 0)))
    mvhd = _full(b"mvhd", 0, 0,
                 struct.pack(">IIII", 0, 0, 600, 0) + b"\0" * 80)
    moov = _box(b"moov", mvhd + trak + mvex)
    ftyp = _box(b"ftyp", b"iso5" + struct.pack(">I", 512)
                + b"iso6mp41")
    out = bytearray(ftyp + moov)
    per = max(1, len(samples) // groups)
    seq = 1
    for lo in range(0, len(samples), per):
        group = samples[lo:lo + per]
        mfhd = _full(b"mfhd", 0, 0, struct.pack(">I", seq))
        seq += 1
        tfhd = _full(b"tfhd", 0, 0x20000,      # default-base-is-moof
                     struct.pack(">I", 1))
        trun_flags = 0x1 | 0x200               # data-offset + sizes
        trun = _box(b"trun", struct.pack(
            ">B3s", 0, trun_flags.to_bytes(3, "big"))
            + struct.pack(">I", len(group)) + struct.pack(">i", 0)
            + b"".join(struct.pack(">I", len(x)) for x in group))
        moof = bytearray(_box(b"moof", mfhd
                              + _box(b"traf", tfhd + trun)))
        ti = bytes(moof).find(b"trun")
        struct.pack_into(">i", moof, ti + 12, len(moof) + 8)
        out += bytes(moof) + _box(b"mdat", b"".join(group))
    path.write_bytes(bytes(out))


def _h264_samples(n=4):
    from gstreamer_tpu.elements.container_elements import (
        _annexb_to_lenpref, _harvest_params, _make_avcc)
    from gstreamer_tpu.native.av import AvVideoEncoder
    enc = AvVideoEncoder("libx264", 64, 48, (30, 1), 300000,
                         "preset=veryfast:tune=zerolatency")
    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, (48, 64), np.uint8)
    u = np.full((24, 32), 128, np.uint8)
    aus = []
    for i in range(n):
        y = np.clip(base.astype(int) + i, 0, 255).astype(np.uint8)
        aus += [p for p, _ in enc.encode((y, u, u))]
    aus += [p for p, _ in enc.flush()]
    cfg = {}
    _harvest_params(aus[0], cfg)
    return ([_annexb_to_lenpref(a) for a in aus],
            _make_avcc(cfg["sps"], cfg.get("pps")))


@needs_av
def test_fragmented_mp4_decodes(tmp_path):
    samples, avcc = _h264_samples()
    path = tmp_path / "frag.mp4"
    _build_fmp4(path, samples, avcc)
    p = parse_launch(f"qtdemux location={path} stream=video ! "
                     "avdec_h264 ! appsink name=out")
    p.run()
    sink = p.get_by_name("out")
    n = 0
    while (s := sink.pull_sample()) is not None:
        n += np.asarray(s.buffer.data[0]).shape[0]
    assert n == len(samples)


@needs_av
def test_fragment_caps_use_trex_duration(tmp_path):
    samples, avcc = _h264_samples()
    path = tmp_path / "frag.mp4"
    _build_fmp4(path, samples, avcc)
    d = parse_launch(f"qtdemux location={path} stream=video ! "
                     "appsink name=out")
    dem = [e for e in d.iterate_elements()
           if e.FACTORY == "qtdemux"][0]
    caps = dem.get_caps()
    s = caps[0]
    assert s["width"] == 64 and s["height"] == 48
    fr = s["framerate"]
    assert (fr.num, fr.denom) == (30, 1)   # timescale 30, dur 1


@needs_av
def test_cmafmux_write_read_roundtrip(tmp_path):
    """cmafmux writes init + per-tick moof/mdat; our fragmented
    reader decodes both tracks back."""
    path = tmp_path / "c.mp4"
    p = parse_launch(
        f"cmafmux name=m location={path} ! fakesink "
        "videotestsrc num-buffers=6 pattern=gradient ! "
        "video/x-raw,format=I420,width=64,height=48,framerate=30/1 ! "
        "x264enc ! m.video_0 "
        "audiotestsrc num-buffers=6 samplesperbuffer=4096 ! "
        "avenc_aac ! m.audio_0")
    p.run()
    data = path.read_bytes()
    assert b"cmfc" in data[:20]
    assert data.count(b"moof") >= 6
    pv = parse_launch(f"qtdemux location={path} stream=video ! "
                      "avdec_h264 ! appsink name=out")
    pv.run()
    sink = pv.get_by_name("out")
    n = 0
    while (s := sink.pull_sample()) is not None:
        n += np.asarray(s.buffer.data[0]).shape[0]
    assert n == 6
    pa = parse_launch(f"qtdemux location={path} stream=audio ! "
                      "appsink name=out")
    pa.run()
    sink = pa.get_by_name("out")
    chunks = []
    while (s := sink.pull_sample()) is not None:
        chunks.append(np.asarray(s.buffer.data))
    pcm = np.concatenate(chunks)
    assert pcm.shape[0] > 20000 and pcm.shape[1] == 1


@needs_av
def test_cmafmux_writes_tfdt(tmp_path):
    """CMAF (ISO 23000-19) requires a tfdt per traf; decode times
    must accumulate across fragments (isomp4 atoms.c)."""
    path = tmp_path / "t.mp4"
    p = parse_launch(
        f"cmafmux name=m location={path} ! fakesink "
        "videotestsrc num-buffers=6 ! "
        "video/x-raw,format=I420,width=64,height=48,framerate=30/1 ! "
        "x264enc ! m.video_0")
    p.run()
    data = path.read_bytes()
    from gstreamer_tpu.elements.isomp4 import _walk_boxes
    times = []
    for tag, a, b in _walk_boxes(data, 0, len(data)):
        if tag != b"moof":
            continue
        for t2, a2, b2 in _walk_boxes(data, a, b):
            if t2 != b"traf":
                continue
            for t3, a3, b3 in _walk_boxes(data, a2, b2):
                if t3 == b"tfdt":
                    assert data[a3] == 1          # version 1, 64-bit
                    times.append(struct.unpack(
                        ">Q", data[a3 + 4:a3 + 12])[0])
    assert len(times) >= 2
    assert times[0] == 0
    assert times == sorted(times) and times[-1] > 0


def test_multi_trun_continuation(tmp_path):
    """§8.8.8: a trun without a data-offset continues at the previous
    run's end, not back at the traf base."""
    from gstreamer_tpu.elements.isomp4 import _parse_fragments
    s1, s2, s3 = b"AAAA", b"BBBBBB", b"CC"
    mfhd = _full(b"mfhd", 0, 0, struct.pack(">I", 1))
    tfhd = _full(b"tfhd", 0, 0x20000, struct.pack(">I", 1))
    def trun(sizes, data_offset=None):
        flags = 0x200 | (0x1 if data_offset is not None else 0)
        body = struct.pack(">B3s", 0, flags.to_bytes(3, "big"))
        body += struct.pack(">I", len(sizes))
        if data_offset is not None:
            body += struct.pack(">i", data_offset)
        body += b"".join(struct.pack(">I", n) for n in sizes)
        return _box(b"trun", body)
    t1 = trun([len(s1)], data_offset=0)     # patched below
    t2 = trun([len(s2), len(s3)])           # NO offset: continues
    traf = _box(b"traf", tfhd + t1 + t2)
    moof = bytearray(_box(b"moof", mfhd + traf))
    ti = bytes(moof).find(b"trun")
    struct.pack_into(">i", moof, ti + 12, len(moof) + 8)
    blob = bytes(moof) + _box(b"mdat", s1 + s2 + s3)
    samples, durs, tfdts = _parse_fragments(blob, {1: (1, 0)})
    got = [blob[o:o + n] for o, n in samples[1]]
    assert got == [s1, s2, s3]


def test_parse_fragments_reads_tfdt():
    """tfdt base decode times are surfaced and, when no durations
    exist anywhere, consecutive tfdt deltas recover them."""
    from gstreamer_tpu.elements.isomp4 import _parse_fragments
    blob = bytearray()
    for i, (bt, payload) in enumerate([(0, b"XX"), (3000, b"YY")]):
        mfhd = _full(b"mfhd", 0, 0, struct.pack(">I", i + 1))
        tfhd = _full(b"tfhd", 0, 0x20000, struct.pack(">I", 1))
        tfdt = _full(b"tfdt", 1, 0, struct.pack(">Q", bt))
        flags = 0x1 | 0x200
        trun = _box(b"trun", struct.pack(
            ">B3s", 0, flags.to_bytes(3, "big"))
            + struct.pack(">I", 1) + struct.pack(">i", 0)
            + struct.pack(">I", len(payload)))
        moof = bytearray(_box(b"moof",
                              mfhd + _box(b"traf", tfhd + tfdt + trun)))
        ti = bytes(moof).find(b"trun")
        struct.pack_into(">i", moof, ti + 12, len(moof) + 8)
        blob += bytes(moof) + _box(b"mdat", payload)
    samples, durs, tfdts = _parse_fragments(bytes(blob), {1: (0, 0)})
    assert tfdts[1] == [(0, 0), (1, 3000)]
    assert len(samples[1]) == 2
