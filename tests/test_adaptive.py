"""hlsdemux / dashdemux on static local + http playlists (reference
gst-plugins-bad/ext/hls/m3u8.c, ext/dash/gstmpdparser.c)."""

import threading

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.net.adaptive import _mpd_duration, parse_m3u8


def _make_segments(tmp_path, n=3, kind="ts"):
    names = []
    for k in range(n):
        if kind == "ts":
            p = parse_launch(
                f"appsrc name=in ! application/octet-stream ! "
                f"mpegtsmux location={tmp_path}/seg{k}.ts")
            p.get_by_name("in").push_buffer(Buffer(
                data=np.frombuffer(bytes([k]) * 2000, np.uint8),
                pts=0))
            p.get_by_name("in").end_of_stream()
            p.run()
            p.set_state("null")
            names.append(f"seg{k}.ts")
        else:
            (tmp_path / f"seg{k}.bin").write_bytes(bytes([0x40 + k])
                                                   * 512)
            names.append(f"seg{k}.bin")
    return names


class TestM3u8Parser:
    def test_media_playlist(self):
        pl = parse_m3u8(
            "#EXTM3U\n#EXT-X-TARGETDURATION:3\n"
            "#EXT-X-MEDIA-SEQUENCE:7\n"
            "#EXTINF:2.5,\na.ts\n#EXTINF:3,\nb.ts\n#EXT-X-ENDLIST\n",
            "/root/x/pl.m3u8")
        assert pl["media_sequence"] == 7
        assert pl["endlist"]
        assert len(pl["segments"]) == 2
        assert pl["segments"][0][0] == 2.5
        assert pl["segments"][0][1].endswith("/root/x/a.ts")

    def test_master_playlist(self):
        pl = parse_m3u8(
            "#EXTM3U\n"
            "#EXT-X-STREAM-INF:BANDWIDTH=100000\nlow.m3u8\n"
            "#EXT-X-STREAM-INF:BANDWIDTH=900000\nhigh.m3u8\n",
            "http://h/x/master.m3u8")
        assert [bw for bw, _ in pl["variants"]] == [100000, 900000]
        assert pl["variants"][1][1] == "http://h/x/high.m3u8"

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            parse_m3u8("not a playlist", "x")


class TestHlsDemux:
    def test_local_master_to_segments(self, tmp_path):
        _make_segments(tmp_path)
        (tmp_path / "media.m3u8").write_text(
            "#EXTM3U\n#EXT-X-TARGETDURATION:2\n"
            "#EXTINF:2,\nseg0.ts\n#EXTINF:2,\nseg1.ts\n"
            "#EXTINF:2,\nseg2.ts\n#EXT-X-ENDLIST\n")
        (tmp_path / "master.m3u8").write_text(
            "#EXTM3U\n#EXT-X-STREAM-INF:BANDWIDTH=1000\nmedia.m3u8\n")
        p = parse_launch(f"hlsdemux uri={tmp_path}/master.m3u8 ! "
                         f"tsparse ! appsink name=out")
        p.run()
        pkts = 0
        while (s := p.get_by_name("out").pull_sample()) is not None:
            d = np.asarray(s.buffer.data)
            assert (d[..., 0] == 0x47).all()
            pkts += d.shape[0] if d.ndim > 1 else 1
        want = sum(len((tmp_path / f"seg{k}.ts").read_bytes()) // 188
                   for k in range(3))
        assert pkts == want

    def test_http_playlist(self, tmp_path):
        import http.server
        import socketserver
        _make_segments(tmp_path, n=2, kind="bin")
        (tmp_path / "m.m3u8").write_text(
            "#EXTM3U\n#EXTINF:1,\nseg0.bin\n#EXTINF:1,\nseg1.bin\n"
            "#EXT-X-ENDLIST\n")

        class H(http.server.SimpleHTTPRequestHandler):
            def __init__(self, *a, **kw):
                super().__init__(*a, directory=str(tmp_path), **kw)

            def log_message(self, *a):
                pass

        with socketserver.TCPServer(("127.0.0.1", 0), H) as httpd:
            port = httpd.server_address[1]
            threading.Thread(target=httpd.serve_forever,
                             daemon=True).start()
            try:
                p = parse_launch(
                    f"hlsdemux uri=http://127.0.0.1:{port}/m.m3u8 ! "
                    f"appsink name=out")
                p.run()
                got = []
                while (s := p.get_by_name("out")
                        .pull_sample()) is not None:
                    got.append(np.asarray(s.buffer.data).tobytes())
            finally:
                httpd.shutdown()
        assert got == [b"\x40" * 512, b"\x41" * 512]


class TestDashDemux:
    def test_segment_list(self, tmp_path):
        _make_segments(tmp_path, n=2, kind="bin")
        (tmp_path / "m.mpd").write_text(
            '<?xml version="1.0"?>'
            '<MPD xmlns="urn:mpeg:dash:schema:mpd:2011" type="static">'
            '<Period><AdaptationSet>'
            '<Representation id="r0" bandwidth="1000">'
            '<SegmentList duration="2" timescale="1">'
            '<SegmentURL media="seg0.bin"/>'
            '<SegmentURL media="seg1.bin"/>'
            '</SegmentList></Representation>'
            '</AdaptationSet></Period></MPD>')
        p = parse_launch(f"dashdemux uri={tmp_path}/m.mpd ! "
                         f"appsink name=out")
        p.run()
        got = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            got.append(np.asarray(s.buffer.data).tobytes())
        assert got == [b"\x40" * 512, b"\x41" * 512]

    def test_segment_template(self, tmp_path):
        for n in (1, 2, 3):
            (tmp_path / f"r0-{n}.bin").write_bytes(bytes([n]) * 64)
        (tmp_path / "m.mpd").write_text(
            '<?xml version="1.0"?>'
            '<MPD xmlns="urn:mpeg:dash:schema:mpd:2011" type="static" '
            'mediaPresentationDuration="PT6S">'
            '<Period><AdaptationSet>'
            '<SegmentTemplate media="$RepresentationID$-$Number$.bin" '
            'duration="2" timescale="1" startNumber="1"/>'
            '<Representation id="r0" bandwidth="1000"/>'
            '</AdaptationSet></Period></MPD>')
        p = parse_launch(f"dashdemux uri={tmp_path}/m.mpd ! "
                         f"appsink name=out")
        p.run()
        got = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            got.append(np.asarray(s.buffer.data).tobytes())
        assert got == [bytes([n]) * 64 for n in (1, 2, 3)]

    def test_picks_highest_bandwidth(self, tmp_path):
        (tmp_path / "hi.bin").write_bytes(b"HI")
        (tmp_path / "lo.bin").write_bytes(b"LO")
        (tmp_path / "m.mpd").write_text(
            '<MPD type="static"><Period><AdaptationSet>'
            '<Representation id="lo" bandwidth="100">'
            '<SegmentList><SegmentURL media="lo.bin"/></SegmentList>'
            '</Representation>'
            '<Representation id="hi" bandwidth="900">'
            '<SegmentList><SegmentURL media="hi.bin"/></SegmentList>'
            '</Representation>'
            '</AdaptationSet></Period></MPD>')
        p = parse_launch(f"dashdemux uri={tmp_path}/m.mpd ! "
                         f"appsink name=out")
        p.run()
        s = p.get_by_name("out").pull_sample()
        assert np.asarray(s.buffer.data).tobytes() == b"HI"

    def test_mpd_duration(self):
        assert _mpd_duration("PT1H2M3.5S") == 3723.5
        assert _mpd_duration("PT6S") == 6.0
        assert _mpd_duration(None) == 0.0


class TestHlsDecode:
    """stream= decode mode: TS segments (H.264 + AAC) concatenated
    and decoded through an internal tsdemux chain."""

    def _build(self, tmp_path):
        from gstreamer_tpu.native import av as native_av
        if not native_av.available():
            pytest.skip("libavcodec shim unavailable")
        for i in range(2):
            seg = tmp_path / f"seg{i}.ts"
            p = parse_launch(
                f"mpegtsmux name=m location={seg} "
                "videotestsrc num-buffers=3 pattern=gradient ! "
                "video/x-raw,format=I420,width=64,height=48,"
                "framerate=30/1 ! x264enc ! m.sink_0 "
                "audiotestsrc num-buffers=3 samplesperbuffer=4096 ! "
                "avenc_aac ! m.sink_1")
            p.run()
        pl = tmp_path / "index.m3u8"
        pl.write_text(
            "#EXTM3U\n#EXT-X-VERSION:3\n#EXT-X-TARGETDURATION:2\n"
            "#EXTINF:1.0,\nseg0.ts\n#EXTINF:1.0,\nseg1.ts\n"
            "#EXT-X-ENDLIST\n")
        return pl

    def test_video(self, tmp_path):
        pl = self._build(tmp_path)
        p = parse_launch(f"hlsdemux uri={pl} stream=video ! "
                         "appsink name=out")
        p.run()
        sink = p.get_by_name("out")
        total = 0
        while (s := sink.pull_sample()) is not None:
            total += np.asarray(s.buffer.data[0]).shape[0]
        assert total == 6                # 3 frames x 2 segments

    def test_audio(self, tmp_path):
        pl = self._build(tmp_path)
        p = parse_launch(f"hlsdemux uri={pl} stream=audio ! "
                         "appsink name=out")
        p.run()
        sink = p.get_by_name("out")
        chunks = []
        while (s := sink.pull_sample()) is not None:
            chunks.append(np.asarray(s.buffer.data))
        pcm = np.concatenate(chunks)
        assert pcm.shape[0] > 20000 and pcm.dtype == np.float32


class TestMss:
    MANIFEST = """<?xml version="1.0"?>
<SmoothStreamingMedia MajorVersion="2" MinorVersion="0"
    Duration="40000000">
  <StreamIndex Type="video" TimeScale="10000000" Chunks="2"
      Url="QualityLevels({bitrate})/Fragments(video={start time})"
      MaxWidth="640" MaxHeight="480">
    <QualityLevel Index="0" Bitrate="300000" FourCC="H264"
        CodecPrivateData="0000000167" MaxWidth="320" MaxHeight="240"/>
    <QualityLevel Index="1" Bitrate="900000" FourCC="H264"
        CodecPrivateData="00000001675aff" MaxWidth="640"
        MaxHeight="480"/>
    <c d="20000000"/>
    <c d="20000000"/>
  </StreamIndex>
  <StreamIndex Type="audio" TimeScale="10000000"
      Url="QualityLevels({bitrate})/Fragments(audio={start time})">
    <QualityLevel Index="0" Bitrate="64000" FourCC="AACL"
        SamplingRate="44100" Channels="2" CodecPrivateData="1210"/>
    <c t="0" d="20000000"/>
    <c d="20000000"/>
  </StreamIndex>
</SmoothStreamingMedia>
"""

    def test_manifest_parse(self, tmp_path):
        from gstreamer_tpu.core.element import element_factory_make
        man = tmp_path / "Manifest"
        man.write_text(self.MANIFEST)
        frag_dir = tmp_path / "QualityLevels(900000)"
        frag_dir.mkdir()
        (frag_dir / "Fragments(video=0)").write_bytes(b"moofdata0")
        (frag_dir / "Fragments(video=20000000)").write_bytes(
            b"moofdata1")
        d = element_factory_make("mssdemux", uri=str(man))
        d.start()
        assert d.manifest_info["bitrate"] == 900000
        assert d.manifest_info["fourcc"] == "H264"
        assert d.manifest_info["codec_private"].startswith(
            b"\x00\x00\x00\x01")
        assert len(d._segments) == 2
        b0 = d.create(1)
        import numpy as np
        assert bytes(np.asarray(b0.data).tobytes()) == b"moofdata0"
        assert abs(b0.duration - 2_000_000_000) < 2
        b1 = d.create(1)
        assert bytes(np.asarray(b1.data).tobytes()) == b"moofdata1"
        assert d.create(1) is None

    def test_audio_stream_type(self, tmp_path):
        from gstreamer_tpu.core.element import element_factory_make
        man = tmp_path / "Manifest"
        man.write_text(self.MANIFEST)
        d = element_factory_make("mssdemux", uri=str(man),
                                 **{"stream-type": "audio"})
        d._load()
        assert d.manifest_info["rate"] == 44100
        assert d.manifest_info["channels"] == 2
        assert "audio=0" in d._segments[0][1]
        assert "audio=20000000" in d._segments[1][1]
