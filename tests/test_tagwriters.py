"""Tag writers (ID3v2 / VorbisComment / Exif / XMP) roundtrip against
the readers, plus the id3v2mux element over a real mp3 stream.

Reference serializers: gst-libs/gst/tag/ — gstvorbistag.c
gst_tag_list_to_vorbiscomment_buffer, gstexiftag.c
gst_tag_list_to_exif_buffer, gstxmptag.c gst_tag_list_to_xmp_buffer,
gsttagmux.c + gstid3v2mux.cc.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import audio_oracle as ao  # noqa: E402

from gstreamer_tpu.core.buffer import Buffer  # noqa: E402
from gstreamer_tpu.core.parse import parse_launch  # noqa: E402
from gstreamer_tpu.core.tags import TagList  # noqa: E402
from gstreamer_tpu.utils.tagreaders import (parse_id3v2,  # noqa: E402
                                            parse_vorbis_comment)
from gstreamer_tpu.utils.tagwriters import (parse_exif,  # noqa: E402
                                            parse_xmp, write_exif,
                                            write_id3v2,
                                            write_vorbis_comment,
                                            write_xmp)


def _sample_tags():
    t = TagList(title="Song Title", artist="The Artist", album="LP",
                comment="nice & clean")
    t.add("append", "track-number", 7)
    t.add("append", "genre", "Electronic")
    return t


class TestRoundtrips:
    @pytest.mark.parametrize("version", [3, 4])
    def test_id3v2(self, version):
        t = _sample_tags()
        blob = write_id3v2(t, version=version)
        assert blob[:3] == b"ID3" and blob[3] == version
        r = parse_id3v2(blob)
        for k in ("title", "artist", "album", "comment", "genre"):
            assert r.get(k) == t.get(k), k
        assert r.get("track-number") == 7

    def test_vorbis_comment(self):
        t = _sample_tags()
        blob = write_vorbis_comment(t, vendor="test-vendor")
        r = parse_vorbis_comment(blob)
        for k in ("title", "artist", "album", "genre"):
            assert r.get(k) == t.get(k), k
        assert r.get("track-number") == 7

    def test_exif(self):
        t = TagList(description="A test image", artist="Photographer",
                    copyright="(c) 2026",
                    datetime="2026:08:17 12:00:00")
        t.add("append", "image-orientation", "rotate-90")
        for bo in ("<", ">"):
            blob = write_exif(t, byte_order=bo)
            r = parse_exif(blob)
            for k in ("description", "artist", "copyright",
                      "datetime", "image-orientation"):
                assert r.get(k) == t.get(k), (bo, k)

    def test_xmp(self):
        t = TagList(title="XMP Title", description="Desc & more",
                    copyright="rights")
        t.add("append", "keywords", "one")
        t.add("append", "keywords", "two")
        blob = write_xmp(t)
        assert blob.startswith(b"<?xpacket")
        r = parse_xmp(blob)
        assert r.get("title") == "XMP Title"
        assert r.get("description") == "Desc & more"
        assert r.get_all("keywords") == ["one", "two"]

    def test_unknown_tags_skipped(self):
        t = TagList()
        t.add("append", "some-exotic-tag", "x")
        assert parse_id3v2(write_id3v2(t)).n_tags() == 0
        assert parse_vorbis_comment(write_vorbis_comment(t)
                                    ).n_tags() == 0


@pytest.mark.skipif(not (ao.have_lame() and ao.have_mpg123()),
                    reason="lame/mpg123 missing")
class TestId3v2MuxElement:
    def test_mux_tags_onto_mp3(self, tmp_path):
        t = np.arange(44100 // 4) / 44100.0
        pcm = (np.sin(2 * np.pi * 440 * t) * 16000).astype(np.int16)
        mp3 = ao.lame_encode(pcm[:, None], 44100, 128)
        src = tmp_path / "in.mp3"
        src.write_bytes(mp3)
        out = tmp_path / "tagged.mp3"
        p = parse_launch(
            f"filesrc location={src} ! mpegaudioparse ! "
            'taginject tags="title=Tagged Song,artist=Me" ! '
            f"id3v2mux ! filesink location={out}")
        p.run()
        p.set_state("null")
        blob = out.read_bytes()
        assert blob[:3] == b"ID3"
        tags = parse_id3v2(blob)
        assert tags.get("title") == "Tagged Song"
        assert tags.get("artist") == "Me"
        # the tagged stream still typefinds and decodes as mp3
        from gstreamer_tpu.codecs import mp3 as M
        from gstreamer_tpu.utils.typefind import type_find_data
        media, _ = type_find_data(blob[:8192])
        assert media.startswith("audio/mpeg")
        pcm2, rate, ch = M.decode(blob)
        assert rate == 44100 and len(pcm2) > 0
        gold = ao.mpg123_decode(blob)
        assert gold is not None and abs(len(gold[0]) - len(pcm2)) < 2000
