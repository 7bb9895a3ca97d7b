"""Robustness fuzzing: parsers on adversarial bytes, caps strings,
audio conversion params (SURVEY §5 sanitizers/fuzzing strategy —
the reference fuzzes typefind/parsers via oss-fuzz)."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch

PARSERS = [
    ("h264parse", "application/octet-stream"),
    ("mpegaudioparse", "application/octet-stream"),
    ("ac3parse", "application/octet-stream"),
    ("flacparse", "application/octet-stream"),
    ("sbcparse", "audio/x-sbc"),
    ("wavpackparse", "audio/x-wavpack"),
    ("tsparse", "video/mpegts"),
    ("jpegparse", "image/jpeg"),
    ("irtspparse", "application/octet-stream"),
    ("mpegvideoparse", "application/octet-stream"),
]


def _feed(factory, caps, blob):
    p = parse_launch(f"appsrc name=in ! {caps} ! {factory} ! "
                     f"fakesink")
    p.get_by_name("in").push_buffer(Buffer(
        data=np.frombuffer(blob, np.uint8), pts=0))
    p.get_by_name("in").end_of_stream()
    try:
        p.run()
    except ValueError:
        pass                    # controlled rejection is fine


class TestParserFuzz:
    @pytest.mark.parametrize("factory,caps", PARSERS)
    def test_random_bytes(self, factory, caps):
        rng = np.random.default_rng(hash(factory) % 2**32)
        for trial in range(4):
            blob = rng.integers(0, 256, 2048, dtype=np.int64) \
                .astype(np.uint8).tobytes()
            _feed(factory, caps, blob)

    @pytest.mark.parametrize("factory,caps", PARSERS)
    def test_truncations_and_syncs(self, factory, caps):
        # sync-byte-heavy garbage exercises resync paths
        rng = np.random.default_rng(1234)
        base = bytes([0x47, 0xFF, 0x9C, 0x24, 0x00, 0x01]) * 300
        noise = rng.integers(0, 256, len(base), dtype=np.int64) \
            .astype(np.uint8).tobytes()
        mixed = bytes(a if i % 3 else b
                      for i, (a, b) in enumerate(zip(base, noise)))
        for blob in (base, mixed, base[:7], b"", b"\x00" * 64):
            _feed(factory, caps, blob)

    def test_pcap_mutations(self):
        import struct
        from tests.test_pcapparse import _ether, _ipv4, _pcap
        good = _pcap([_ether(_ipv4(b"x" * 20))])
        rng = np.random.default_rng(7)
        for _ in range(8):
            m = bytearray(good)
            for _ in range(5):
                m[int(rng.integers(24, len(m)))] = int(
                    rng.integers(0, 256))
            _feed("pcapparse", "raw/x-pcap", bytes(m))

    def test_ivf_mutations(self):
        import struct
        hdr = b"DKIF" + struct.pack("<HH4sHHIIII", 0, 32, b"VP80",
                                    32, 24, 30, 1, 2, 0)
        good = hdr + struct.pack("<IQ", 16, 0) + bytes(16)
        rng = np.random.default_rng(9)
        for _ in range(8):
            m = bytearray(good)
            m[int(rng.integers(12, len(m)))] = int(
                rng.integers(0, 256))
            _feed("ivfparse", "video/x-ivf", bytes(m))


class TestCapsFuzz:
    def test_roundtrip_random_fields(self):
        from gstreamer_tpu.core.caps import Caps
        rng = np.random.default_rng(11)
        names = ["video/x-raw", "audio/x-raw", "application/x-rtp"]
        for _ in range(30):
            name = names[int(rng.integers(0, len(names)))]
            parts = [name]
            for k in range(int(rng.integers(0, 4))):
                v = int(rng.integers(-1000, 100000))
                parts.append(f"f{k}={v}")
            text = ", ".join(parts)
            c = Caps.from_string(text)
            again = Caps.from_string(str(c))
            assert c[0].name == again[0].name

    def test_malformed_strings_raise_cleanly(self):
        from gstreamer_tpu.core.caps import Caps
        for text in ("video/x-raw, width=[5", "a=,b=",
                     "x, =3", "video/x-raw, f={1,"):
            try:
                Caps.from_string(text)
            except (ValueError, KeyError, IndexError):
                pass            # clean rejection, no crash


class TestAudioFuzz:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_convert_random_configs(self, seed):
        rng = np.random.default_rng(seed)
        fmts = ["S16LE", "F32LE", "S32LE", "U8"]
        src = fmts[int(rng.integers(0, len(fmts)))]
        dst = fmts[int(rng.integers(0, len(fmts)))]
        rate = int(rng.choice([8000, 16000, 44100, 48000]))
        ch = int(rng.integers(1, 3))
        p = parse_launch(
            f"audiotestsrc num-buffers=2 samplesperbuffer=333 ! "
            f"audio/x-raw,format={src},rate={rate},channels={ch} ! "
            f"audioconvert ! audio/x-raw,format={dst} ! "
            f"audioresample ! audio/x-raw,rate=22050 ! appsink "
            f"name=out")
        p.run()
        s = p.get_by_name("out").pull_sample()
        assert s is not None
