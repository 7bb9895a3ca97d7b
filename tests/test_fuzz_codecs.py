"""Robustness fuzzing for the round-3 codec/container parsers:
adversarial bytes must raise controlled errors (ValueError /
EndOfData), never crash or hang (SURVEY §5 fuzzing strategy)."""

import struct

import numpy as np
import pytest

from gstreamer_tpu.codecs import aac as A
from gstreamer_tpu.codecs import vpx
from gstreamer_tpu.elements import container_elements as ce


def _rng(tag):
    return np.random.default_rng(hash(tag) % 2**32)


def _blobs(tag, n=30, size=512):
    rng = _rng(tag)
    out = [bytes(rng.integers(0, 256, size, np.uint8)) for _ in
           range(n)]
    # structured prefixes to get past magic checks
    out.append(b"\xff\xf1" + bytes(rng.integers(0, 256, 64, np.uint8)))
    out.append(b"DKIF" + bytes(rng.integers(0, 256, 64, np.uint8)))
    out.append(b"")
    out.append(b"\x00")
    return out


class TestAacFuzz:
    def test_adts_stream(self):
        for blob in _blobs("adts"):
            try:
                A.decode_adts(blob)
            except (ValueError, A.EndOfData, IndexError):
                pass

    def test_raw_frames(self):
        dec = A.AACDecoder(4, 2)
        for blob in _blobs("aacraw"):
            try:
                dec.decode_frame(A.Bits(blob))
            except (ValueError, A.EndOfData, IndexError):
                pass

    def test_asc(self):
        for blob in _blobs("asc", size=8):
            try:
                A.parse_audio_specific_config(blob)
            except (ValueError, A.EndOfData, IndexError):
                pass


class TestContainerFuzz:
    def test_xiph_private(self):
        for blob in _blobs("xiph", size=64):
            try:
                ce._parse_xiph_private(blob)
            except (ValueError, IndexError):
                pass

    def test_hvcc(self):
        for blob in _blobs("hvcc", size=128):
            try:
                ce._parse_hvcc(blob)
            except (ValueError, IndexError, struct.error):
                pass

    def test_av1_obu(self):
        for blob in _blobs("obu", size=128):
            ce._av1_seq_obu(blob)       # must never raise

    def test_ivf(self):
        for blob in _blobs("ivf", size=128):
            try:
                vpx.parse_ivf(blob)
            except (ValueError, IndexError):
                pass

    def test_esds(self):
        from gstreamer_tpu.elements.isomp4 import _parse_esds
        for blob in _blobs("esds", size=128):
            try:
                _parse_esds(blob)
            except (ValueError, IndexError, struct.error):
                pass


@pytest.mark.skipif(not vpx.available(), reason="libvpx missing")
class TestVpxFuzz:
    def test_decode_garbage(self):
        dec = vpx.VpxDecoder("vp8")
        for blob in _blobs("vp8pkt", n=10, size=256):
            try:
                dec.decode(blob)
            except ValueError:
                pass
