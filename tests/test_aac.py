"""Clean-room AAC-LC decoder parity vs the system libavcodec
(aac_oracle): the same gold-decoder architecture the reference uses
for AAC (gst-libav; gst-plugins-bad ext/faad wraps faad2).

PNS is excluded from exact-parity runs (aac_pns=0 at the encoder):
ISO 14496-3 §4.6.13 leaves the noise generator decoder-defined, so no
two decoders match bit-for-bit on PNS bands."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import aac_oracle as ao  # noqa: E402

from gstreamer_tpu.codecs import aac as A  # noqa: E402

needs_aac = pytest.mark.skipif(not ao.have_aac(),
                               reason="system libavcodec missing")

NO_PNS = "aac_pns=0"


def snr_db(gold, mine):
    n = min(len(gold), len(mine))
    g = np.asarray(gold[:n], np.float64)
    p = np.asarray(mine[:n], np.float64)
    err = p - g
    sig = max(float((g ** 2).mean()), 1e-300)
    return 10 * np.log10(sig / max(float((err ** 2).mean()), 1e-300))


def _i16(x):
    return np.clip(np.round(np.asarray(x) * 32767),
                   -32768, 32767).astype(np.int16)


def _roundtrip(sig, rate, bitrate=128000, opts=NO_PNS, layout=""):
    adts = ao.aac_encode_adts(sig, rate, bitrate, opts, layout)
    assert adts is not None
    gold = ao.aac_decode_adts(adts)
    assert gold is not None
    pcm, r, ch = A.decode_adts(adts)
    assert (r, ch) == (gold[1], gold[2])
    return gold[0], pcm


@needs_aac
class TestParity:
    @pytest.mark.parametrize("rate", [8000, 22050, 44100, 48000, 96000])
    def test_stereo_tones(self, rate):
        t = np.arange(rate) / rate
        sig = _i16(np.stack([np.sin(2 * np.pi * 440 * t),
                             np.sin(2 * np.pi * 661 * t)], 1) * 0.4)
        gold, pcm = _roundtrip(sig, rate)
        assert snr_db(gold, pcm) > 60

    def test_mono(self):
        rate = 44100
        t = np.arange(rate) / rate
        gold, pcm = _roundtrip(_i16(np.sin(2 * np.pi * 440 * t)
                                    [:, None] * 0.4), rate)
        assert snr_db(gold, pcm) > 60

    def test_transients_short_windows(self):
        rate = 44100
        rng = np.random.default_rng(7)
        t = np.arange(rate) / rate
        x = np.zeros(rate)
        for k in range(20):
            p = k * 2000 + 500
            x[p:p + 300] = np.sin(2 * np.pi * 1000 * t[:300]) \
                * np.hanning(300)
        x += rng.standard_normal(rate) * 0.02
        gold, pcm = _roundtrip(_i16(np.stack([x, -x * 0.7], 1) * 0.8),
                               rate)
        assert snr_db(gold, pcm) > 60

    def test_noise_tns(self):
        rate = 44100
        rng = np.random.default_rng(3)
        sig = _i16(rng.standard_normal((rate, 2)) * 0.2)
        gold, pcm = _roundtrip(sig, rate)
        assert snr_db(gold, pcm) > 60

    def test_intensity_stereo_low_bitrate(self):
        rate = 44100
        t = np.arange(rate) / rate
        sig = _i16(np.stack([np.sin(2 * np.pi * 440 * t) * 0.4,
                             np.sin(2 * np.pi * 445 * t) * 0.38], 1))
        gold, pcm = _roundtrip(sig, rate, bitrate=16000)
        assert snr_db(gold, pcm) > 60

    @pytest.mark.parametrize("nch,layout", [
        (3, "3.0"), (4, "4.0"), (5, "5.0"), (6, "5.1"), (8, "7.1")])
    def test_multichannel(self, nch, layout):
        rate = 48000
        t = np.arange(rate // 2) / rate
        x = np.stack([np.sin(2 * np.pi * (200 + 100 * k) * t) * 0.3
                      for k in range(nch)], 1)
        gold, pcm = _roundtrip(_i16(x), rate, bitrate=64000 * nch,
                               layout=layout)
        assert snr_db(gold, pcm) > 60

    def test_raw_asc_path(self):
        rate = 48000
        t = np.arange(rate // 2) / rate
        sig = _i16(np.stack([np.sin(2 * np.pi * 440 * t),
                             np.sin(2 * np.pi * 661 * t)], 1) * 0.4)
        adts = ao.aac_encode_adts(sig, rate, 128000, NO_PNS)
        gold, _, _ = ao.aac_decode_adts(adts)
        pkts = []
        pos = 0
        sfi = cc = 0
        while pos + 7 <= len(adts):
            flen, sfi, cc, _p, hlen = A.parse_adts_header(adts, pos)
            pkts.append(adts[pos + hlen:pos + flen])
            pos += flen
        v = (2 << 11) | (sfi << 7) | (cc << 3)
        pcm, r, ch = A.decode_raw(bytes([v >> 8, v & 0xFF]), pkts)
        assert (r, ch) == (rate, 2)
        assert snr_db(gold, pcm) > 60

    def test_garbage_prefix_resync(self):
        rate = 44100
        t = np.arange(rate // 2) / rate
        sig = _i16(np.sin(2 * np.pi * 440 * t)[:, None] * 0.4)
        adts = ao.aac_encode_adts(sig, rate, 128000, NO_PNS)
        gold, _, _ = ao.aac_decode_adts(adts)
        pcm, r, ch = A.decode_adts(b"\x12\x34\x56" + adts)
        assert snr_db(gold, pcm) > 60

    def test_pns_energy_preserved(self):
        """With PNS active the waveforms differ by design; the decoded
        signal energy must still be in the right ballpark."""
        rate = 44100
        rng = np.random.default_rng(9)
        env = np.abs(np.sin(2 * np.pi * 3 * np.arange(rate) / rate))
        sig = _i16((rng.standard_normal(rate) * env * 0.3)[:, None])
        adts = ao.aac_encode_adts(sig, rate, 128000, "aac_pns=1")
        gold, _, _ = ao.aac_decode_adts(adts)
        pcm, _, _ = A.decode_adts(adts)
        n = min(len(gold), len(pcm))
        ge = float((gold[:n] ** 2).mean())
        pe = float((pcm[:n] ** 2).mean())
        assert 0.5 < pe / ge < 2.0


@needs_aac
class TestElement:
    def test_pipeline_decode(self, tmp_path):
        from gstreamer_tpu.core.parse import parse_launch
        rate = 44100
        t = np.arange(rate // 2) / rate
        sig = _i16(np.stack([np.sin(2 * np.pi * 440 * t),
                             np.sin(2 * np.pi * 661 * t)], 1) * 0.4)
        adts = ao.aac_encode_adts(sig, rate, 128000, NO_PNS)
        gold, _, _ = ao.aac_decode_adts(adts)
        path = tmp_path / "t.aac"
        path.write_bytes(adts)
        p = parse_launch(f"filesrc location={path} ! aacparse ! "
                         "faad ! appsink name=o")
        p.run()
        sink = p.get_by_name("o")
        got = []
        caps = None
        while True:
            s = sink.pull_sample()
            if s is None:
                break
            caps = s.caps
            got.append(np.asarray(s.buffer.data))
        pcm = np.concatenate(got, axis=0)
        assert int(caps[0]["rate"]) == 44100
        assert int(caps[0]["channels"]) == 2
        assert len(pcm) == len(gold)
        assert snr_db(gold, pcm) > 60


def _split_adts(adts):
    pkts, pos, sfi, cc = [], 0, 0, 0
    while pos + 7 <= len(adts):
        flen, sfi, cc, _p, hlen = A.parse_adts_header(adts, pos)
        pkts.append(adts[pos + hlen:pos + flen])
        pos += flen
    return pkts, sfi, cc


def _asc(sfi, cc):
    v = (2 << 11) | (sfi << 7) | (cc << 3)
    return bytes([v >> 8, v & 0xFF])


def _pull_audio(p, name="out"):
    sink = p.get_by_name(name)
    got = []
    while True:
        s = sink.pull_sample()
        if s is None:
            break
        got.append(np.asarray(s.buffer.data))
    return np.concatenate(got, axis=0)


@needs_aac
class TestContainers:
    def _vector(self, rate=44100):
        t = np.arange(rate // 2) / rate
        sig = _i16(np.stack([np.sin(2 * np.pi * 440 * t),
                             np.sin(2 * np.pi * 661 * t)], 1) * 0.4)
        adts = ao.aac_encode_adts(sig, rate, 128000, NO_PNS)
        gold, _, _ = ao.aac_decode_adts(adts)
        return adts, gold

    def test_mp4_mp4a_esds(self, tmp_path):
        """Hand-built minimal mp4 with an mp4a/esds AAC track
        (qtdemux.c esds handling)."""
        import struct
        from gstreamer_tpu.core.parse import parse_launch
        from gstreamer_tpu.elements.isomp4 import _box, _full
        rate = 44100
        adts, gold = self._vector(rate)
        pkts, sfi, cc = _split_adts(adts)
        asc = _asc(sfi, cc)
        dsi = bytes([0x05, len(asc)]) + asc
        dcd = bytes([0x04, 13 + len(dsi), 0x40, 0x15, 0, 0, 0,
                     0, 2, 0, 0, 0, 2, 0, 0]) + dsi
        es = bytes([0x03, 3 + len(dcd), 0, 0, 0]) + dcd
        esds = _full(b"esds", 0, 0, es)
        entry = (b"\0" * 6 + struct.pack(">H", 1)      # data_ref
                 + b"\0" * 8
                 + struct.pack(">HH", 2, 16)           # ch, bits
                 + b"\0" * 4
                 + struct.pack(">I", rate << 16) + esds)
        stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1)
                     + _box(b"mp4a", entry))
        stts = _full(b"stts", 0, 0, struct.pack(
            ">III", 1, len(pkts), 1024))
        stsc = _full(b"stsc", 0, 0, struct.pack(
            ">IIII", 1, 1, len(pkts), 1))
        stsz = _full(b"stsz", 0, 0, struct.pack(
            ">II", 0, len(pkts))
            + b"".join(struct.pack(">I", len(p)) for p in pkts))
        mdat_payload = b"".join(pkts)
        ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512)
                    + b"isomiso2mp41")
        mdat_off = len(ftyp) + 8
        stco = _full(b"stco", 0, 0, struct.pack(">II", 1, mdat_off))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _box(b"minf", stbl)
        mdhd = _full(b"mdhd", 0, 0, struct.pack(
            ">IIIIHH", 0, 0, rate, len(pkts) * 1024, 0x55C4, 0))
        hdlr = _full(b"hdlr", 0, 0, b"\0" * 4 + b"soun" + b"\0" * 13)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", mdia)
        moov = _box(b"moov", trak)
        path = tmp_path / "a.mp4"
        path.write_bytes(ftyp + _box(b"mdat", mdat_payload) + moov)
        p = parse_launch(
            f"qtdemux location={path} stream=audio ! appsink name=out")
        p.run()
        pcm = _pull_audio(p)
        assert snr_db(gold, pcm) > 60

    def test_mkv_a_aac(self, tmp_path):
        from gstreamer_tpu.core.parse import parse_launch
        sys.path.insert(0, os.path.dirname(__file__))
        from test_matroska_codecs import _mkv_audio
        rate = 44100
        adts, gold = self._vector(rate)
        pkts, sfi, cc = _split_adts(adts)
        path = tmp_path / "a.mkv"
        _mkv_audio(path, "A_AAC", _asc(sfi, cc), rate, 2,
                   [(0, p) for p in pkts])
        p = parse_launch(
            f"matroskademux location={path} stream=audio ! "
            "appsink name=out")
        p.run()
        pcm = _pull_audio(p)
        assert snr_db(gold, pcm) > 60

    def test_mpegts_adts_roundtrip(self, tmp_path):
        from gstreamer_tpu.core.parse import parse_launch
        rate = 44100
        adts, gold = self._vector(rate)
        src = tmp_path / "a.aac"
        src.write_bytes(adts)
        ts = tmp_path / "a.ts"
        p = parse_launch(f"filesrc location={src} ! aacparse ! "
                         f"mpegtsmux location={ts}")
        p.run()
        d = parse_launch(f"tsdemux location={ts} ! aacparse ! faad ! "
                         "appsink name=out")
        d.run()
        pcm = _pull_audio(d)
        assert snr_db(gold, pcm) > 60


@needs_aac
def test_adts_header_parse():
    hdr = ao.adts_header(100, 44100, 2)
    flen, sfi, cc, profile, hlen = A.parse_adts_header(hdr + b"\0" * 100)
    assert flen == 107 and sfi == 4 and cc == 2
    assert profile == 1 and hlen == 7
