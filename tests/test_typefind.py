"""Typefind breadth (gsttypefindfunctions.c analog)."""

import numpy as np
import pytest

from gstreamer_tpu.utils.typefind import (CERTAIN, LIKELY, POSSIBLE,
                                          type_find_data)

CASES = [
    (b"YUV4MPEG2 W64 H48\n", "application/x-yuv4mpeg"),
    (b"RIFF\x00\x00\x00\x00WAVEfmt ", "audio/x-wav"),
    (b"RF64\x00\x00\x00\x00WAVEds64", "audio/x-rf64"),
    (b"RIFF\x00\x00\x00\x00AVI LIST", "video/x-msvideo"),
    (b"RIFF\x00\x00\x00\x00WEBPVP8 ", "image/webp"),
    (b"\x89PNG\r\n\x1a\n\x00\x00", "image/png"),
    (b"\xff\xd8\xff\xe0\x00\x10JFIF", "image/jpeg"),
    (b"GIF89a\x00\x00", "image/gif"),
    (b"II*\x00\x08\x00\x00\x00", "image/tiff"),
    (b"OggS\x00\x02", "application/ogg"),
    (b"fLaC\x00\x00\x00\x22", "audio/x-flac"),
    (b"ID3\x04\x00", "audio/mpeg, mpegversion=(int)1, layer=(int)3"),
    (b"\x0b\x77\x12\x34", "audio/x-ac3"),
    (b"\x7f\xfe\x80\x01\x00", "audio/x-dts"),
    (b"#!AMR\n\x3c", "audio/amr"),
    (b"\x1a\x45\xdf\xa3 doctype webm", "video/webm"),
    (b"\x1a\x45\xdf\xa3 matroska here", "video/x-matroska"),
    (b"\x00\x00\x00\x18ftypisom\x00\x00\x02\x00",
     "video/quicktime, variant=(string)iso"),
    (b"\x00\x00\x00\x18ftypM4A \x00\x00\x02\x00", "audio/x-m4a"),
    (b"\x00\x00\x00\x18ftypqt  \x00\x00\x02\x00", "video/quicktime"),
    (b"\x00\x00\x00\x18ftypavif\x00\x00\x00\x00", "image/avif"),
    (b"FLV\x01\x05", "video/x-flv"),
    (b"\x00\x00\x01\xba\x44\x00", "video/mpeg, systemstream=(boolean)true"),
    (b"\x00\x00\x01\xb3\x16\x00",
     "video/mpeg, systemstream=(boolean)false, mpegversion=(int)1"),
    (b"\x00\x00\x00\x01\x67\x42\x00\x1e",
     "video/x-h264, stream-format=(string)byte-stream"),
    (b"\x00\x00\x00\x01\x40\x01\x0c",
     "video/x-h265, stream-format=(string)byte-stream"),
    (b"DKIF\x00\x00 \x00VP80", "video/x-ivf"),
    (b"\x06\x0e\x2b\x34\x02\x05", "application/mxf"),
    (b"\x30\x26\xb2\x75\x8e\x66\xcf\x11\xa6\xd9", "video/x-ms-asf"),
    (b"WEBVTT\n\n00:00", "application/x-subtitle-vtt"),
    (b"%PDF-1.7\n", "application/pdf"),
    (b"\x1f\x8b\x08\x00", "application/x-gzip"),
    (b"\xfd7zXZ\x00\x00", "application/x-xz"),
    (b"wvpk\x00\x00", "audio/x-wavpack"),
    (b"MThd\x00\x00\x00\x06", "audio/midi"),
    (b"#EXTM3U\n#EXT-X-VERSION:3\n", "application/x-hls"),
    (b"<?xml version=\"1.0\"?>\n<x/>", "application/xml"),
    (b"hello, plain text file\n", "text/plain"),
]


@pytest.mark.parametrize("case", CASES, ids=[c[1] for c in CASES])
def test_signatures(case):
    head, media = case
    got, prob = type_find_data(head)
    assert got == media
    assert prob >= POSSIBLE


def test_mpeg_ts_sync():
    pkt = bytearray(188 * 5)
    for i in range(5):
        pkt[i * 188] = 0x47
    got, prob = type_find_data(bytes(pkt))
    assert got.startswith("video/mpegts") and "188" in got


def test_unknown_is_octet_stream():
    got, prob = type_find_data(bytes(np.random.default_rng(0).integers(
        128, 256, 64, dtype=np.uint8)))
    assert got == "application/octet-stream"


def test_breadth():
    """The signature table covers a broad slice of the reference's ~100
    detectors."""
    from gstreamer_tpu.utils.typefind import _FINDERS
    assert len(_FINDERS) >= 60
