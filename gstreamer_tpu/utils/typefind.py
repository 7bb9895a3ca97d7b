"""Typefinding — content sniffing.

Reference: subprojects/gst-plugins-base/gst/typefind/
gsttypefindfunctions.c (7363 LoC, ~100 formats).  This covers the
formats the framework can ingest plus common signatures reported for
diagnostics.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

# (caps-ish media type, probability)
CERTAIN = 100
LIKELY = 80
POSSIBLE = 50


def type_find_data(head: bytes) -> Tuple[str, int]:
    """Sniff a buffer's media type (gst_type_find_helper semantics)."""
    if head.startswith(b"YUV4MPEG2 "):
        return "application/x-yuv4mpeg", CERTAIN
    if head.startswith(b"RIFF") and head[8:12] == b"WAVE":
        return "audio/x-wav", CERTAIN
    if head.startswith(b"RIFF") and head[8:12] == b"AVI ":
        return "video/x-msvideo", CERTAIN
    if head.startswith(b"\x89PNG\r\n\x1a\n"):
        return "image/png", CERTAIN
    if head.startswith(b"\xff\xd8\xff"):
        return "image/jpeg", CERTAIN
    if head.startswith(b"GIF8"):
        return "image/gif", CERTAIN
    if head.startswith(b"BM"):
        return "image/bmp", LIKELY
    if head.startswith(b"OggS"):
        return "application/ogg", CERTAIN
    if head.startswith(b"fLaC"):
        return "audio/x-flac", CERTAIN
    if head.startswith(b"ID3") or (len(head) > 1 and head[0] == 0xFF
                                   and (head[1] & 0xE0) == 0xE0):
        return "audio/mpeg", LIKELY
    if len(head) >= 12 and head[4:8] == b"ftyp":
        return "video/quicktime", CERTAIN
    if head.startswith(b"\x1a\x45\xdf\xa3"):
        return "video/x-matroska", CERTAIN
    if head.startswith(b"FLV"):
        return "video/x-flv", CERTAIN
    if head.startswith(b"#EXTM3U"):
        return "application/x-hls", LIKELY
    return "application/octet-stream", POSSIBLE


def type_find_file(path: str) -> Tuple[str, int]:
    with open(path, "rb") as f:
        return type_find_data(f.read(64))


# media types the framework can decode to raw today
DECODABLE = {
    "application/x-yuv4mpeg": "filesrc",
    "audio/x-wav": "wavparse",
}
