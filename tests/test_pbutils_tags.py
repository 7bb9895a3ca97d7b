"""pbutils (codec descriptions, encoding profiles), tag readers,
watchdog element."""

import struct
import time

from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.core.pipeline import State
from gstreamer_tpu.utils.pbutils import (EncodingContainerProfile,
                                         get_codec_description,
                                         profile_from_string)
from gstreamer_tpu.utils.tagreaders import parse_id3v2, parse_vorbis_comment


def test_codec_descriptions():
    assert get_codec_description("video/x-h264") == "H.264 / AVC"
    assert get_codec_description(
        "audio/mpeg, mpegversion=(int)1, layer=(int)3").startswith("MP3")
    assert get_codec_description("video/x-raw") == "Uncompressed video"


def test_encoding_profile_from_string():
    p = profile_from_string(
        "video/quicktime:video/x-h264:audio/mpeg")
    assert isinstance(p, EncodingContainerProfile)
    kinds = [sub.format[0].name for sub in p.get_profiles()]
    assert kinds == ["video/x-h264", "audio/mpeg"]
    v = profile_from_string("video/x-h264")
    assert v.format[0].name == "video/x-h264"


def _id3_frame(fid, text, version=4):
    body = b"\x03" + text.encode()
    if version >= 4:
        sz = len(body)
        size = bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                      (sz >> 7) & 0x7F, sz & 0x7F])
    else:
        size = struct.pack(">I", len(body))
    return fid + size + b"\x00\x00" + body


def test_id3v2():
    frames = (_id3_frame(b"TIT2", "My Song") + _id3_frame(b"TPE1", "Me")
              + _id3_frame(b"TRCK", "3/12"))
    sz = len(frames)
    header = b"ID3\x04\x00\x00" + bytes([
        (sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F])
    tags = parse_id3v2(header + frames)
    assert tags.get("title") == "My Song"
    assert tags.get("artist") == "Me"
    assert tags.get("track-number") == 3


def test_vorbis_comment():
    fields = [b"TITLE=Water", b"ARTIST=Nobody", b"TRACKNUMBER=7"]
    data = struct.pack("<I", 4) + b"test"
    data += struct.pack("<I", len(fields))
    for f in fields:
        data += struct.pack("<I", len(f)) + f
    tags = parse_vorbis_comment(data)
    assert tags.get("title") == "Water"
    assert tags.get("track-number") == 7


def test_watchdog_triggers_on_stall():
    p = parse_launch("videotestsrc num-buffers=100 ! "
                     "video/x-raw,format=I420,width=32,height=32,"
                     "framerate=30/1 ! watchdog name=w timeout=200 ! "
                     "fakesink")
    p.set_state(State.PLAYING)
    p.tick()
    w = p.get_by_name("w")
    assert not w.triggered
    time.sleep(0.4)                    # stall: no more ticks
    assert w.triggered
    assert any(m.type == "error" and "Watchdog" in str(m.data)
               for m in p.bus.messages())
    p.set_state(State.NULL)
