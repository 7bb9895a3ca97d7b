"""G.711 law codecs: exhaustive bit-parity against scalar golds
transliterated from the reference C, reference-table spot values, and
pipeline integration."""

import numpy as np
import pytest

from gstreamer_tpu.audio import law
from gstreamer_tpu.core.parse import parse_launch

# -- scalar golds (direct transliterations of the C routines) ----------


def _gold_mulaw_encode(sample):
    """mulaw-conversion.c:34-83 (ZEROTRAP off)."""
    exp_lut = [0] * 256
    for i in range(1, 256):
        exp_lut[i] = i.bit_length() - 1
    sample = int(sample)
    sign = (sample >> 8) & 0x80
    if sign:
        # C negates in gint16: wraps at -32768
        sample = ((-sample + 0x8000) % 0x10000) - 0x8000
    mag = sample & 0xFFFF          # (guint16) reinterpretation
    if mag > 32635:
        mag = 32635
    s = mag + 0x84
    exponent = exp_lut[(s >> 7) & 0xFF]
    mantissa = (s >> (exponent + 3)) & 0x0F
    return ~(sign | (exponent << 4) | mantissa) & 0xFF


def _gold_mulaw_decode(ulawbyte):
    """mulaw-conversion.c:101-122."""
    exp_lut = [0, 132, 396, 924, 1980, 4092, 8316, 16764]
    b = ~ulawbyte & 0xFF
    sign = b & 0x80
    exponent = (b >> 4) & 0x07
    mantissa = b & 0x0F
    linear = exp_lut[exponent] + (mantissa << (exponent + 3))
    return -linear if sign else linear


def _gold_alaw_encode(pcm_val):
    """alaw-encode.c:241-305 (algorithmic form == the default table)."""
    if pcm_val >= 0:
        mask = 0xD5
    else:
        mask = 0x55
        pcm_val = min(-pcm_val, 0x7FFF)
    if pcm_val < 256:
        aval = pcm_val >> 4
    else:
        seg = (pcm_val >> 8).bit_length()
        aval = (seg << 4) | ((pcm_val >> (seg + 3)) & 0x0F)
    return aval ^ mask


def _gold_alaw_decode(a_val):
    """alaw-decode.c:96-113."""
    a_val ^= 0x55
    t = a_val & 0x7F
    if t < 16:
        t = (t << 4) + 8
    else:
        seg = (t >> 4) & 0x07
        t = (((t & 0x0F) << 4) + 0x108) << (seg - 1)
    return t if (a_val & 0x80) else -t


ALL_S16 = np.arange(-32768, 32768, dtype=np.int16)
ALL_U8 = np.arange(256, dtype=np.uint8)


class TestExhaustiveParity:
    def test_mulaw_encode_all_inputs(self):
        gold = np.array([_gold_mulaw_encode(s) for s in ALL_S16],
                        np.uint8)
        np.testing.assert_array_equal(law.mulaw_encode(ALL_S16), gold)

    def test_mulaw_decode_all_codes(self):
        gold = np.array([_gold_mulaw_decode(int(u)) for u in ALL_U8],
                        np.int16)
        np.testing.assert_array_equal(law.mulaw_decode(ALL_U8), gold)

    def test_alaw_encode_all_inputs(self):
        gold = np.array([_gold_alaw_encode(int(s)) for s in ALL_S16],
                        np.uint8)
        np.testing.assert_array_equal(law.alaw_encode(ALL_S16), gold)

    def test_alaw_decode_all_codes(self):
        gold = np.array([_gold_alaw_decode(int(u)) for u in ALL_U8],
                        np.int16)
        np.testing.assert_array_equal(law.alaw_decode(ALL_U8), gold)

    def test_jit_matches_numpy(self):
        import jax
        import jax.numpy as jnp
        for fn, xs in [(law.mulaw_encode, ALL_S16),
                       (law.mulaw_decode, ALL_U8),
                       (law.alaw_encode, ALL_S16),
                       (law.alaw_decode, ALL_U8)]:
            np.testing.assert_array_equal(
                np.asarray(jax.jit(fn)(jnp.asarray(xs))), fn(xs))


class TestReferenceTables:
    """Spot values copied from the reference's default lookup tables."""

    def test_alaw_decode_table_spots(self):
        # alaw-decode.c:55 first row / sign symmetry / extrema
        assert law.alaw_decode(np.uint8([0]))[0] == -5504
        assert law.alaw_decode(np.uint8([1]))[0] == -5248
        assert law.alaw_decode(np.uint8([0x80]))[0] == 5504
        assert int(law.alaw_decode(ALL_U8).min()) == -32256
        assert int(law.alaw_decode(ALL_U8).max()) == 32256

    def test_alaw_encode_table_spots(self):
        # alaw-encode.c table: entry[0]=0xd5 => -1..-15 -> 0x55;
        # entry[2048]=0x2a is the -32768 edge
        assert law.alaw_encode(np.int16([0]))[0] == 0xD5
        assert law.alaw_encode(np.int16([-1]))[0] == 0x55
        assert law.alaw_encode(np.int16([-32768]))[0] == 0x2A
        assert law.alaw_encode(np.int16([32767]))[0] == 0xAA

    def test_mulaw_spots(self):
        assert law.mulaw_encode(np.int16([0]))[0] == 0xFF
        assert law.mulaw_encode(np.int16([-32768]))[0] == 0x00
        assert law.mulaw_decode(np.uint8([0xFF]))[0] == 0
        assert law.mulaw_decode(np.uint8([0x00]))[0] == -32124

    def test_roundtrip_code_identity(self):
        # every law code survives decode->encode (both laws)
        np.testing.assert_array_equal(
            law.alaw_encode(law.alaw_decode(ALL_U8)), ALL_U8)
        # mu-law: 0x7F is "negative zero" — decodes to 0 which
        # re-encodes as the positive-zero code 0xFF
        got = law.mulaw_encode(law.mulaw_decode(ALL_U8))
        keep = ALL_U8 != 0x7F
        np.testing.assert_array_equal(got[keep], ALL_U8[keep])
        assert got[0x7F] == 0xFF


class TestLawElements:
    @pytest.mark.parametrize("enc,dec,mt", [
        ("mulawenc", "mulawdec", "audio/x-mulaw"),
        ("alawenc", "alawdec", "audio/x-alaw"),
    ])
    def test_pipeline_roundtrip(self, enc, dec, mt):
        p = parse_launch(
            f"audiotestsrc num-buffers=2 samplesperbuffer=256 wave=sine "
            f"! audio/x-raw,format=S16LE,rate=8000,channels=1 "
            f"! {enc} ! {dec} ! appsink name=out")
        p.run()
        sink = p.get_by_name("out")
        got = 0
        while True:
            s = sink.pull_sample()
            if s is None:
                break
            x = np.asarray(s.buffer.data)
            assert x.dtype == np.int16
            # companding quantizes: error bounded by the segment step
            got += x.shape[-1] if x.ndim else len(x)
        assert got > 0

    def test_coded_caps_negotiated(self):
        p = parse_launch(
            "audiotestsrc num-buffers=1 "
            "! audio/x-raw,format=S16LE,rate=44100,channels=2 "
            "! mulawenc ! appsink name=out")
        p.run()
        s = p.get_by_name("out").pull_sample()
        caps = s.caps[0]
        assert caps.name == "audio/x-mulaw"
        assert caps["rate"] == 44100 and caps["channels"] == 2
        assert np.asarray(s.buffer.data).dtype == np.uint8

    def test_encode_matches_dsp_in_pipeline(self):
        p = parse_launch(
            "audiotestsrc num-buffers=1 samplesperbuffer=128 wave=square "
            "! audio/x-raw,format=S16LE,rate=8000,channels=1 "
            "! tee name=t t. ! queue ! appsink name=raw "
            "t. ! queue ! alawenc ! appsink name=coded")
        p.run()
        raw = np.asarray(p.get_by_name("raw").pull_sample().buffer.data)
        coded = np.asarray(
            p.get_by_name("coded").pull_sample().buffer.data)
        np.testing.assert_array_equal(
            coded, law.alaw_encode(raw.astype(np.int16)))


class TestStereoElement:
    """stereo (gststereo.c): scalar gold incl. the half-buffer quirk."""

    def _gold(self, x, mul):
        data = x.reshape(-1).astype(np.int64).copy()
        samples = len(data)
        i = 0
        while i < samples // 2:
            avg = int((int(data[i]) + int(data[i + 1])) / 2)  # trunc div
            ldiff = data[i] - avg
            rdiff = data[i + 1] - avg
            for j, diff in ((i, ldiff), (i + 1, rdiff)):
                tmp = avg + diff * mul
                tmp = min(max(tmp, -32768), 32767)
                data[j] = int(tmp)   # trunc toward zero
            i += 2
        return data.reshape(x.shape).astype(np.int16)

    def test_gold_parity(self):
        rng = np.random.default_rng(5)
        x = (rng.standard_normal((101, 2)) * 12000).astype(np.int16)
        p = parse_launch(
            "appsrc name=in ! audio/x-raw,format=S16LE,rate=8000,"
            "channels=2 ! stereo stereo=0.6 ! appsink name=out")
        from gstreamer_tpu.core.buffer import Buffer
        p.get_by_name("in").push_buffer(Buffer(data=x))
        p.get_by_name("in").end_of_stream()
        p.run()
        got = np.asarray(p.get_by_name("out").pull_sample().buffer.data)
        np.testing.assert_array_equal(got, self._gold(x, 0.6))
