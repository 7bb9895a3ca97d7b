"""Compressed A/V tracks in Matroska: A_VORBIS / V_THEORA (xiph-laced
CodecPrivate), A_OPUS (OpusHead CodecPrivate) and A_MPEG/L3.

Reference behavior: gst-plugins-good/gst/matroska/matroska-mux.c
(xiph header lacing) and matroska-demux.c (per-codec track setup).
Parity gold comes from the REAL system codecs (audio_oracle /
theora_oracle) decoding the same packets."""

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import audio_oracle as ao  # noqa: E402
import theora_oracle as to  # noqa: E402

from gstreamer_tpu.core.parse import parse_launch  # noqa: E402
from gstreamer_tpu.elements import container_elements as ce  # noqa: E402
from gstreamer_tpu.elements.ogg import ogg_page  # noqa: E402

needs_vorbis = pytest.mark.skipif(not ao.have_vorbis(),
                                  reason="system libvorbis missing")
needs_opus = pytest.mark.skipif(not ao.have_opus(),
                                reason="system libopus missing")
needs_lame = pytest.mark.skipif(
    not (ao.have_lame() and ao.have_mpg123()),
    reason="system lame/mpg123 missing")
needs_theora = pytest.mark.skipif(not to.have_theora(),
                                  reason="system libtheora missing")


def snr_db(gold, mine):
    n = min(len(gold), len(mine))
    g = np.asarray(gold[:n], np.float64)
    p = np.asarray(mine[:n], np.float64)
    err = p - g
    sig = max(float((g ** 2).mean()), 1e-300)
    return 10 * np.log10(sig / max(float((err ** 2).mean()), 1e-300))


def _tone(rate, ch, seconds=1.0):
    t = np.arange(int(rate * seconds), dtype=np.float64) / rate
    cols = [np.sin(2 * np.pi * (440 + 220 * c) * t) * 0.4
            for c in range(ch)]
    return np.stack(cols, axis=1)


def _pull_audio(p, sink_name="out"):
    sink = p.get_by_name(sink_name)
    chunks = []
    while True:
        s = sink.pull_sample()
        if s is None:
            break
        chunks.append(np.asarray(s.buffer.data))
    return np.concatenate(chunks, axis=0) if chunks else np.zeros((0, 1))


def _pull_video(p, sink_name="out"):
    sink = p.get_by_name(sink_name)
    frames = []
    while True:
        s = sink.pull_sample()
        if s is None:
            break
        d = [np.asarray(x) for x in s.buffer.data]
        for k in range(d[0].shape[0]):
            frames.append(tuple(x[k] for x in d))
    return frames


def _mkv_audio(path, codec_id, codec_private, rate, ch,
               blocks):
    """Hand-build a one-track audio mkv: blocks = [(ts_ms, payload)]."""
    header = (ce.ebml_uint(0x4286, 1) + ce.ebml_uint(0x42F7, 1)
              + ce.ebml_uint(0x42F2, 4) + ce.ebml_uint(0x42F3, 8)
              + ce.ebml_str(0x4282, "matroska")
              + ce.ebml_uint(0x4287, 2) + ce.ebml_uint(0x4285, 2))
    audio = (ce.ebml_float(ce.SAMPLING_FREQ, float(rate))
             + ce.ebml_uint(ce.CHANNELS, ch))
    entry = (ce.ebml_uint(ce.TRACK_NUMBER, 1)
             + ce.ebml_uint(ce.TRACK_UID, 1)
             + ce.ebml_uint(ce.TRACK_TYPE, 2)
             + ce.ebml_str(ce.CODEC_ID, codec_id))
    if codec_private:
        entry += ce.ebml_elem(ce.CODEC_PRIVATE, codec_private)
    entry += ce.ebml_elem(ce.AUDIO, audio)
    body = b""
    for ts, payload in blocks:
        body += ce.ebml_elem(
            ce.SIMPLE_BLOCK,
            ce.ebml_size(1) + struct.pack(">h", 0) + b"\x80" + payload)
    cluster = ce.ebml_elem(ce.CLUSTER,
                           ce.ebml_uint(ce.CLUSTER_TS, 0) + body)
    seg = (ce.ebml_elem(ce.SEG_INFO,
                        ce.ebml_uint(ce.TIMESTAMP_SCALE, 1_000_000))
           + ce.ebml_elem(ce.TRACKS, ce.ebml_elem(ce.TRACK_ENTRY, entry))
           + cluster)
    with open(path, "wb") as f:
        f.write(ce.ebml_elem(ce.EBML_HEADER, header)
                + ce.ebml_id(ce.SEGMENT) + b"\xFF" + seg)


def test_xiph_lace_roundtrip():
    pkts = [b"a" * 3, b"b" * 255, b"c" * 700]
    assert ce._parse_xiph_private(ce._xiph_lace(pkts)) == pkts


@needs_vorbis
def test_vorbis_track_parity_vs_libvorbisfile(tmp_path):
    """A_VORBIS demux must match libvorbisfile decoding the SAME
    packets (delivered via Ogg) to >=60 dB."""
    rate = 44100
    sig = _tone(rate, 2)
    headers, audio = ao.vorbis_encode_packets(
        np.asarray(sig, np.float32), rate, 0.4)
    path = tmp_path / "a.mkv"
    _mkv_audio(path, "A_VORBIS", ce._xiph_lace(headers), rate, 2,
               [(0, pkt) for pkt, _ in audio])
    p = parse_launch(
        f"matroskademux location={path} stream=audio ! appsink name=out")
    p.run()
    pcm = _pull_audio(p)
    pages = [ogg_page([headers[0]], 1, 0, 0, bos=True),
             ogg_page(headers[1:], 1, 1, 0)]
    seq = 2
    for i, (pkt, gran) in enumerate(audio):
        pages.append(ogg_page([pkt], 1, seq, gran,
                              eos=(i == len(audio) - 1)))
        seq += 1
    gold, grate, gch = ao.vorbis_decode_bytes(b"".join(pages))
    assert (grate, gch) == (rate, 2)
    assert snr_db(gold, pcm) > 60


@needs_vorbis
def test_mux_demux_vorbis_roundtrip(tmp_path):
    path = tmp_path / "v.mkv"
    p = parse_launch(
        f"matroskamux name=m location={path} audio-codec=vorbis ! "
        "fakesink "
        "audiotestsrc num-buffers=8 samplesperbuffer=4096 ! m.audio_0")
    p.run()
    pr = parse_launch(
        "audiotestsrc num-buffers=8 samplesperbuffer=4096 ! "
        "appsink name=out")
    pr.run()
    gold = _pull_audio(pr).astype(np.float64) / 32768.0
    pd = parse_launch(
        f"matroskademux location={path} stream=audio ! appsink name=out")
    pd.run()
    pcm = _pull_audio(pd)
    # vorbis adds codec delay: trim edges, compare the body
    assert snr_db(gold[2048:len(gold) - 2048],
                  pcm[2048:len(gold) - 2048]) > 15


@needs_opus
def test_opus_track_parity_vs_libopus(tmp_path):
    from gstreamer_tpu.codecs.opus import opus_head
    rate = 48000
    sig = np.clip(np.round(_tone(rate, 2, 0.5) * 32767),
                  -32768, 32767).astype(np.int16)
    packets = ao.opus_encode_packets(sig, rate)
    path = tmp_path / "o.mkv"
    _mkv_audio(path, "A_OPUS", opus_head(2, 0, rate), rate, 2,
               [(0, pkt) for pkt in packets])
    p = parse_launch(
        f"matroskademux location={path} stream=audio ! appsink name=out")
    p.run()
    pcm = _pull_audio(p)
    gold = ao.opus_decode_packets(packets, 2)
    np.testing.assert_allclose(pcm, gold, atol=1e-6)


@needs_lame
def test_mp3_track_parity_vs_mpg123(tmp_path):
    rate = 44100
    sig = np.clip(np.round(_tone(rate, 2, 0.5) * 32767),
                  -32768, 32767).astype(np.int16)
    blob = ao.lame_encode(sig, rate)
    path = tmp_path / "m.mkv"
    _mkv_audio(path, "A_MPEG/L3", b"", rate, 2, [(0, blob)])
    p = parse_launch(
        f"matroskademux location={path} stream=audio ! appsink name=out")
    p.run()
    pcm = _pull_audio(p)
    gold, grate, gch = ao.mpg123_decode(blob)
    assert (grate, gch) == (rate, 2)
    assert snr_db(gold, pcm) > 60


@needs_lame
def test_avi_mp3_audio_tag55(tmp_path):
    """WAVE_FORMAT_MPEGLAYER3 (0x55) audio in AVI ##wb chunks
    (gstavidemux.c audio tag table)."""
    rate = 44100
    sig = np.clip(np.round(_tone(rate, 2, 0.5) * 32767),
                  -32768, 32767).astype(np.int16)
    blob = ao.lame_encode(sig, rate)
    strh = (b"auds" + b"\x00" * 16
            + struct.pack("<II", 1, rate) + b"\x00" * 4
            + struct.pack("<I", len(blob)) + b"\x00" * 20)
    strf = struct.pack("<HHIIHH", 0x55, 2, rate, rate * 16000 // 8,
                       1, 16)
    strl = (b"strh" + struct.pack("<I", len(strh)) + strh
            + b"strf" + struct.pack("<I", len(strf)) + strf)
    hdrl = (b"hdrl"
            + b"LIST" + struct.pack("<I", 4 + len(strl)) + b"strl"
            + strl)
    if len(blob) & 1:
        blob += b"\x00"
    movi = b"movi" + b"00wb" + struct.pack("<I", len(blob)) + blob
    body = (b"AVI "
            + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
            + b"LIST" + struct.pack("<I", len(movi)) + movi)
    path = tmp_path / "m.avi"
    path.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)
    p = parse_launch(
        f"avidemux location={path} stream=audio ! appsink name=out")
    p.run()
    pcm = _pull_audio(p)
    gold, grate, gch = ao.mpg123_decode(blob)
    assert (grate, gch) == (rate, 2)
    assert snr_db(gold, pcm) > 60


@needs_theora
def test_mux_demux_theora_bit_exact_vs_libtheoradec(tmp_path):
    """Theora mux roundtrip: the demuxed frames must equal the REAL
    libtheoradec decode of the packets in the file (the clean-room
    decoder is bit-exact vs the reference decoder)."""
    path = tmp_path / "t.mkv"
    p = parse_launch(
        f"matroskamux name=m location={path} video-codec=theora ! "
        "fakesink "
        "videotestsrc num-buffers=5 pattern=gradient ! "
        "video/x-raw,format=I420,width=64,height=48,framerate=30/1 ! "
        "m.video_0")
    p.run()
    tracks, blocks, data = ce._parse_matroska(str(path))
    (track,) = tracks
    assert track["codec"] == "V_THEORA"
    assert track["width"] == 64 and track["height"] == 48
    headers = ce._parse_xiph_private(track["codec_private"])
    packets = [data[off:off + size]
               for _, _, off, size, _d in blocks]
    gold, _info = to.decode_packets(headers, packets)
    pd = parse_launch(
        f"matroskademux location={path} stream=video ! appsink name=out")
    pd.run()
    got = _pull_video(pd)
    assert len(got) == len(gold) == 5
    for g, o in zip(gold, got):
        for a, b in zip(g, o):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@needs_theora
@needs_vorbis
def test_mux_demux_theora_vorbis_av(tmp_path):
    """Both compressed tracks in one file, selected by stream=."""
    path = tmp_path / "av.mkv"
    p = parse_launch(
        f"matroskamux name=m location={path} video-codec=theora "
        "audio-codec=vorbis ! fakesink "
        "videotestsrc num-buffers=5 ! "
        "video/x-raw,format=I420,width=64,height=48,framerate=30/1 ! "
        "m.video_0 "
        "audiotestsrc num-buffers=5 samplesperbuffer=4096 ! m.audio_0")
    p.run()
    pv = parse_launch(
        f"matroskademux location={path} stream=video ! appsink name=out")
    pv.run()
    frames = _pull_video(pv)
    assert len(frames) == 5
    assert frames[0][0].shape == (48, 64)
    pa = parse_launch(
        f"matroskademux location={path} stream=audio ! appsink name=out")
    pa.run()
    pcm = _pull_audio(pa)
    assert len(pcm) > 4096 and pcm.dtype == np.float32


def test_mkv_subtitle_track_roundtrip(tmp_path):
    """S_TEXT/UTF8 subtitle tracks: subparse cues muxed as
    BlockGroup + BlockDuration, demuxed with exact timing
    (matroska-mux.c subtitle pads / matroska-demux.c)."""
    path = tmp_path / "s.mkv"
    srt = (b"1\n00:00:00,000 --> 00:00:01,000\nHello world\n\n"
           b"2\n00:00:01,000 --> 00:00:02,500\nSecond cue\n")
    p = parse_launch(
        f"matroskamux name=m location={path} ! fakesink "
        "videotestsrc num-buffers=3 ! "
        "video/x-raw,format=I420,width=64,height=48,framerate=30/1 ! "
        "m.video_0 "
        "appsrc name=subs ! application/octet-stream ! subparse ! "
        "m.subtitle_0")
    from gstreamer_tpu.core.buffer import Buffer
    p.get_by_name("subs").push_buffer(Buffer(
        data=np.frombuffer(srt, np.uint8), pts=0))
    p.get_by_name("subs").end_of_stream()
    p.run()
    assert b"S_TEXT/UTF8" in path.read_bytes()
    d = parse_launch(f"matroskademux location={path} "
                     "stream=subtitle ! appsink name=out")
    d.run()
    sink = d.get_by_name("out")
    cues = []
    while (s := sink.pull_sample()) is not None:
        cues.append((s.buffer.pts, s.buffer.duration,
                     s.buffer.data[0]))
    assert cues == [(0, 1_000_000_000, "Hello world"),
                    (1_000_000_000, 1_500_000_000, "Second cue")]


def test_blockgroup_parsing(tmp_path):
    """BlockGroup/Block/BlockDuration clusters (real-world muxers use
    them) parse alongside SimpleBlocks."""
    path = tmp_path / "bg.mkv"
    header = (ce.ebml_uint(0x4286, 1) + ce.ebml_uint(0x42F7, 1)
              + ce.ebml_uint(0x42F2, 4) + ce.ebml_uint(0x42F3, 8)
              + ce.ebml_str(0x4282, "matroska")
              + ce.ebml_uint(0x4287, 2) + ce.ebml_uint(0x4285, 2))
    entry = (ce.ebml_uint(ce.TRACK_NUMBER, 1)
             + ce.ebml_uint(ce.TRACK_UID, 1)
             + ce.ebml_uint(ce.TRACK_TYPE, 0x11)
             + ce.ebml_str(ce.CODEC_ID, "S_TEXT/UTF8"))
    block = (ce.ebml_size(1) + struct.pack(">h", 5) + b"\x00"
             + b"via blockgroup")
    group = ce.ebml_elem(
        ce.BLOCK_GROUP,
        ce.ebml_elem(ce.BLOCK, block)
        + ce.ebml_uint(ce.BLOCK_DURATION, 750))
    cluster = ce.ebml_elem(ce.CLUSTER,
                           ce.ebml_uint(ce.CLUSTER_TS, 100) + group)
    seg = (ce.ebml_elem(ce.SEG_INFO,
                        ce.ebml_uint(ce.TIMESTAMP_SCALE, 1_000_000))
           + ce.ebml_elem(ce.TRACKS,
                          ce.ebml_elem(ce.TRACK_ENTRY, entry))
           + cluster)
    path.write_bytes(ce.ebml_elem(ce.EBML_HEADER, header)
                     + ce.ebml_id(ce.SEGMENT) + b"\xFF" + seg)
    tracks, blocks, data = ce._parse_matroska(str(path))
    assert blocks[0][0] == 1 and blocks[0][1] == 105
    assert blocks[0][4] == 750
    d = parse_launch(f"matroskademux location={path} "
                     "stream=subtitle ! appsink name=out")
    d.run()
    s = d.get_by_name("out").pull_sample()
    assert s.buffer.data[0] == "via blockgroup"
    assert s.buffer.pts == 105_000_000
    assert s.buffer.duration == 750_000_000


def test_opusparse_toc_durations():
    """RFC 6716 TOC durations (gstopusparse.c)."""
    from gstreamer_tpu.elements.xiph import OpusParse
    # config 0 (SILK NB 10ms), code 0
    assert OpusParse.packet_duration_ns(bytes([0x00, 1])) == 10_000_000
    # config 3 (SILK NB 60ms)
    assert OpusParse.packet_duration_ns(bytes([3 << 3, 1])) == 60_000_000
    # code 1: two frames
    assert OpusParse.packet_duration_ns(bytes([0x01, 1])) == 20_000_000
    # CELT FB 20ms (config 31)
    assert OpusParse.packet_duration_ns(
        bytes([31 << 3, 1])) == 20_000_000


def test_theoraparse_attaches_caps():
    import numpy as np
    import theora_oracle as to
    if not to.have_theora():
        pytest.skip("libtheora missing")
    from gstreamer_tpu.codecs import theora_enc
    frames = [(np.zeros((48, 64), np.uint8),
               np.full((24, 32), 128, np.uint8),
               np.full((24, 32), 128, np.uint8))]
    headers, _pkts = theora_enc.encode_packets(frames, 64, 48, (30, 1))
    from gstreamer_tpu.core.buffer import Buffer
    from gstreamer_tpu.elements.xiph import TheoraParse
    out = TheoraParse().host_process(Buffer(
        data=[np.frombuffer(headers[0], np.uint8)], batch=1))
    caps = out.meta["caps"]
    assert caps[0]["width"] == 64 and caps[0]["height"] == 48
