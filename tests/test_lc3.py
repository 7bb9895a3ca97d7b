"""LC3 (Bluetooth LE Audio, ETSI TS 103 634 re-spec): range-encoder
parity, codec roundtrip across the full config space, elements.

No LC3 implementation exists in this environment (the reference wraps
liblc3, which isn't bundled), so there is no bit-parity oracle; the
codec is validated by its defining structural properties — exact
frame-bytes framing for every budget in [20, 400], bitrate-monotone
quality, PLC — plus encode→decode roundtrip SNR.
"""

import random

import numpy as np
import pytest

from gstreamer_tpu.codecs.celt import RangeDecoder
from gstreamer_tpu.codecs.entenc import RangeEncoder
from gstreamer_tpu.codecs.lc3 import (Lc3Decoder, Lc3Encoder,
                                      default_frame_bytes,
                                      frame_samples)
from gstreamer_tpu.core.parse import parse_launch


def _snr(ref, got):
    n = min(len(ref), len(got))
    a = np.asarray(ref[:n], np.float64)
    b = np.asarray(got[:n], np.float64)
    return 10 * np.log10(max(np.sum(a * a), 1e-12)
                         / max(np.sum((a - b) ** 2), 1e-12))


def _tonal(rate, n, seed=0):
    t = np.arange(n) / rate
    sig = (9000 * np.sin(2 * np.pi * 330 * t)
           + 3000 * np.sin(2 * np.pi * 0.11 * rate * t + seed)
           + 1000 * np.sin(2 * np.pi * 0.02 * rate * t))
    sig *= 0.6 + 0.4 * np.sin(2 * np.pi * 3 * t)
    return np.round(sig).astype(np.int16)


class TestRangeEncoder:
    """The encode side of the RFC 6716-style coder must be the exact
    inverse of the existing RangeDecoder, including tell()."""

    def test_mixed_symbol_parity(self):
        rng = random.Random(11)
        for _ in range(60):
            size = rng.randint(6, 48)
            enc = RangeEncoder(size)
            ops = []
            while enc.tell() < size * 8 - 40:
                kind = rng.choice(("enc", "bit", "uint", "bits"))
                if kind == "enc":
                    ft = rng.randint(2, 256)
                    fl = rng.randint(0, ft - 1)
                    fh = rng.randint(fl + 1, ft)
                    enc.encode(fl, fh, ft)
                    ops.append(("enc", fl, fh, ft, enc.tell()))
                elif kind == "bit":
                    logp = rng.randint(1, 8)
                    b = rng.randint(0, 1)
                    enc.enc_bit_logp(b, logp)
                    ops.append(("bit", b, logp, enc.tell()))
                elif kind == "uint":
                    ft = rng.randint(2, 5000)
                    v = rng.randint(0, ft - 1)
                    enc.enc_uint(v, ft)
                    ops.append(("uint", v, ft, enc.tell()))
                else:
                    nb = rng.randint(1, 12)
                    v = rng.randint(0, (1 << nb) - 1)
                    enc.enc_bits(v, nb)
                    ops.append(("bits", v, nb, enc.tell()))
            buf = enc.done()
            assert len(buf) == size and not enc.error
            dec = RangeDecoder(buf)
            for op in ops:
                if op[0] == "enc":
                    _, fl, fh, ft, tl = op
                    s = dec.decode(ft)
                    assert fl <= s < fh
                    dec.update(fl, fh, ft)
                elif op[0] == "bit":
                    _, b, logp, tl = op
                    assert dec.dec_bit_logp(logp) == b
                elif op[0] == "uint":
                    _, v, ft, tl = op
                    assert dec.dec_uint(ft) == v
                else:
                    _, v, nb, tl = op
                    assert dec.dec_bits(nb) == v
                assert dec.tell() == op[-1]  # exact tell symmetry


class TestLc3Codec:
    def test_frame_samples(self):
        # gstlc3common.h:31 rates x both durations, NF integral
        assert frame_samples(48000, 10000) == 480
        assert frame_samples(48000, 7500) == 360
        assert frame_samples(8000, 7500) == 60

    @pytest.mark.parametrize("rate", [8000, 24000, 48000])
    @pytest.mark.parametrize("dur", [10000, 7500])
    def test_exact_frame_bytes_all_budgets(self, rate, dur):
        nf = frame_samples(rate, dur)
        sig = _tonal(rate, nf * 3)
        for fb in (20, 80, 400):
            enc = Lc3Encoder(rate, 1, dur, fb)
            for i in range(3):
                assert len(enc.encode_frame(
                    sig[i * nf:(i + 1) * nf])) == fb

    @pytest.mark.parametrize("rate,dur,fb,min_snr", [
        (48000, 10000, 120, 30.0),   # 96 kbit/s (typical LE Audio)
        (48000, 10000, 400, 50.0),
        (32000, 10000, 160, 40.0),
        (24000, 7500, 80, 35.0),
        (16000, 10000, 80, 30.0),
        (8000, 10000, 40, 25.0),
    ])
    def test_roundtrip_snr(self, rate, dur, fb, min_snr):
        enc = Lc3Encoder(rate, 1, dur, fb)
        dec = Lc3Decoder(rate, 1, dur, fb)
        nf = enc.nf
        n = 10
        sig = _tonal(rate, nf * n)
        outs = [dec.decode_frame(enc.encode_frame(
            sig[i * nf:(i + 1) * nf]))[:, 0] for i in range(n)]
        out = np.concatenate(outs)
        # one-frame MDCT latency
        assert _snr(sig[:nf * (n - 1)], out[nf:]) > min_snr

    def test_quality_monotone_in_bitrate(self):
        rate, dur, nf = 48000, 10000, 480
        sig = _tonal(rate, nf * 8)
        snrs = []
        for fb in (20, 60, 160, 400):
            enc = Lc3Encoder(rate, 1, dur, fb)
            dec = Lc3Decoder(rate, 1, dur, fb)
            out = np.concatenate(
                [dec.decode_frame(enc.encode_frame(
                    sig[i * nf:(i + 1) * nf]))[:, 0] for i in range(8)])
            snrs.append(_snr(sig[:nf * 7], out[nf:]))
        assert snrs == sorted(snrs), snrs

    def test_silence(self):
        enc = Lc3Encoder(48000, 1)
        dec = Lc3Decoder(48000, 1)
        z = np.zeros(enc.nf, np.int16)
        for _ in range(3):
            out = dec.decode_frame(enc.encode_frame(z))
        assert np.abs(out).max() <= 1

    def test_stereo(self):
        enc = Lc3Encoder(48000, 2, 10000, 100)
        dec = Lc3Decoder(48000, 2, 10000, 100)
        nf = enc.nf
        t = np.arange(nf * 6) / 48000
        l = (7000 * np.sin(2 * np.pi * 500 * t)).astype(np.int16)
        r = (7000 * np.sin(2 * np.pi * 900 * t)).astype(np.int16)
        pcm = np.stack([l, r], axis=1)
        outs = []
        for i in range(6):
            b = enc.encode_frame(pcm[i * nf:(i + 1) * nf])
            assert len(b) == 200  # frame_bytes per channel
            outs.append(dec.decode_frame(b))
        out = np.concatenate(outs, axis=0)
        assert _snr(l[:nf * 5], out[nf:, 0]) > 30
        assert _snr(r[:nf * 5], out[nf:, 1]) > 30

    def test_plc(self):
        enc = Lc3Encoder(48000, 1, 10000, 120)
        dec = Lc3Decoder(48000, 1, 10000, 120)
        nf = enc.nf
        sig = _tonal(48000, nf * 6)
        for i in range(3):
            good = dec.decode_frame(
                enc.encode_frame(sig[i * nf:(i + 1) * nf]))
        lost1 = dec.decode_frame(None)
        # concealment keeps comparable energy, then decays
        e_good = float(np.mean(good.astype(np.float64) ** 2))
        e1 = float(np.mean(lost1.astype(np.float64) ** 2))
        assert e1 > 0.2 * e_good
        for _ in range(10):
            last = dec.decode_frame(None)
        assert float(np.mean(last.astype(np.float64) ** 2)) < 0.01 * \
            max(e_good, 1.0)

    def test_corrupt_frame_conceals(self):
        dec = Lc3Decoder(48000, 1, 10000, 120)
        out = dec.decode_frame(b"\xff" * 120)  # garbage, must not raise
        assert out.shape == (480, 1)

    def test_default_frame_bytes(self):
        assert default_frame_bytes(10000) == 120   # 96 kbit/s
        assert default_frame_bytes(7500) == 90


class TestLc3Elements:
    def test_pipeline_roundtrip(self):
        p = parse_launch(
            "audiotestsrc num-buffers=10 samplesperbuffer=480 "
            "wave=sine freq=440 volume=0.4 ! "
            "audio/x-raw,format=S16LE,rate=48000,channels=1 ! "
            "lc3enc ! lc3dec ! appsink name=out")
        p.run()
        outs = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            assert s.caps[0].name == "audio/x-raw"
            outs.append(np.asarray(s.buffer.data).reshape(-1))
        got = np.concatenate(outs)
        assert len(got) == 4800
        g = parse_launch(
            "audiotestsrc num-buffers=10 samplesperbuffer=480 "
            "wave=sine freq=440 volume=0.4 ! "
            "audio/x-raw,format=S16LE,rate=48000,channels=1 ! "
            "appsink name=out")
        g.run()
        want = np.concatenate(
            [np.asarray(s.buffer.data).reshape(-1)
             for s in iter(g.get_by_name("out").pull_sample, None)])
        assert _snr(want[480:-480], got[960:]) > 20.0

    def test_coded_caps(self):
        p = parse_launch(
            "audiotestsrc num-buffers=2 samplesperbuffer=480 ! "
            "audio/x-raw,format=S16LE,rate=48000,channels=1 ! "
            "lc3enc ! appsink name=out")
        p.run()
        s = p.get_by_name("out").pull_sample()
        caps = s.caps[0]
        assert caps.name == "audio/x-lc3"
        assert caps["rate"] == 48000
        assert caps["channels"] == 1
        assert caps["frame-duration-us"] == 10000
        assert caps["frame-bytes"] == 120

    def test_caps_filtered_frame_bytes(self):
        p = parse_launch(
            "audiotestsrc num-buffers=4 samplesperbuffer=480 "
            "wave=sine freq=600 volume=0.5 ! "
            "audio/x-raw,format=S16LE,rate=48000,channels=1 ! "
            "lc3enc ! audio/x-lc3,frame-bytes=40 ! "
            "lc3dec ! appsink name=out")
        p.run()
        outs = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            outs.append(np.asarray(s.buffer.data).reshape(-1))
        assert len(np.concatenate(outs)) == 1920

    def test_duration_7500(self):
        p = parse_launch(
            "audiotestsrc num-buffers=6 samplesperbuffer=360 "
            "wave=sine freq=500 volume=0.5 ! "
            "audio/x-raw,format=S16LE,rate=48000,channels=1 ! "
            "lc3enc frame-duration-us=7500 ! appsink name=out")
        p.run()
        s = p.get_by_name("out").pull_sample()
        assert s.caps[0]["frame-duration-us"] == 7500
        assert s.caps[0]["frame-bytes"] == 90


class TestLc3Robustness:
    def test_decoder_fuzz_never_crashes(self):
        """Arbitrary frame bytes must decode (or conceal) — the
        decoder guards every parse failure with PLC, like a lossy
        Bluetooth link demands."""
        import numpy as np
        rng = np.random.default_rng(42)
        dec = Lc3Decoder(48000, 1, 10000, 60)
        for _ in range(50):
            frame = rng.integers(0, 256, 60, dtype=np.uint8).tobytes()
            out = dec.decode_frame(frame)
            assert out.shape == (480, 1)
            assert out.dtype == np.int16

    def test_fullscale_square_wave(self):
        """Full-scale hard-clipping input: exact frame sizes, bounded
        output, no overflow through the rate loop."""
        import numpy as np
        enc = Lc3Encoder(48000, 1, 10000, 160)
        dec = Lc3Decoder(48000, 1, 10000, 160)
        nf = enc.nf
        t = np.arange(nf * 5)
        sig = np.where((t // 48) % 2 == 0, 32767, -32768).astype(
            np.int16)
        for i in range(5):
            b = enc.encode_frame(sig[i * nf:(i + 1) * nf])
            assert len(b) == 160
            out = dec.decode_frame(b)
            assert np.abs(out.astype(np.int64)).max() <= 32768
