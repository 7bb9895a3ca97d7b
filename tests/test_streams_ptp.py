"""Stream collections/TOC/URI/context utilities + PTP clock +
downloadbuffer."""

import numpy as np

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.caps import Caps
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.core.pipeline import State
from gstreamer_tpu.core.streams import (Context, ContextRegistry, Stream,
                                        StreamCollection, StreamType, Toc,
                                        TocEntry, element_make_from_uri,
                                        filename_to_uri, uri_get_location,
                                        uri_get_protocol, uri_is_valid)
from gstreamer_tpu.net.clock import PtpClock, PtpProvider, SystemClock


def test_stream_collection():
    col = StreamCollection("src0")
    col.add_stream(Stream("src0/video:0", Caps.from_string("video/x-raw"),
                          StreamType.VIDEO))
    col.add_stream(Stream("src0/audio:0", Caps.from_string("audio/x-raw"),
                          StreamType.AUDIO))
    assert col.get_size() == 2
    assert col.get_stream(0).stream_type == StreamType.VIDEO


def test_toc():
    toc = Toc()
    ch1 = TocEntry("chapter", "ch.1", start=0, stop=10_000_000_000)
    ch1.append_sub_entry(TocEntry("chapter", "ch.1.1", start=0,
                                  stop=5_000_000_000))
    toc.append_entry(ch1)
    assert toc.find_entry("ch.1.1").stop == 5_000_000_000
    assert toc.find_entry("nope") is None


def test_uri_helpers(tmp_path):
    p = str(tmp_path / "a file.y4m")
    uri = filename_to_uri(p)
    assert uri_is_valid(uri)
    assert uri_get_protocol(uri) == "file"
    assert uri_get_location(uri) == p
    open(p, "wb").write(b"YUV4MPEG2 W64 H48 F30:1\n")
    e = element_make_from_uri(uri)
    assert e.FACTORY == "filesrc"
    assert e.get_property("location") == p
    e2 = element_make_from_uri("udp://127.0.0.1:5004")
    assert e2.FACTORY == "udpsrc"
    assert e2.get_property("port") == 5004


def test_context_registry():
    reg = ContextRegistry()
    reg.set_context(Context("gtpu.device", values={"platform": "tpu"}))
    assert reg.get_context("gtpu.device").values["platform"] == "tpu"
    assert reg.get_context("missing") is None


def test_ptp_clock_converges():
    master = PtpProvider()
    master.start()
    try:
        slave = PtpClock("127.0.0.1", master.port)
        assert slave.sync(10)
        # both clocks are the local monotonic clock here, so after
        # regression the slave must track the master closely
        diff = abs(slave.get_time() - SystemClock().get_time())
        assert diff < 50_000_000      # 50 ms bound (loopback jitter)
        slave.close()
    finally:
        master.stop()


def test_downloadbuffer_spools():
    p = parse_launch(
        "appsrc name=in caps=application/octet-stream ! "
        "downloadbuffer name=d ! appsink name=s")
    data = np.arange(4096, dtype=np.uint8) % 251
    p.get_by_name("in").push_buffer(Buffer(data=data, batch=1))
    p.set_state(State.PLAYING)
    assert p.tick()
    d = p.get_by_name("d")
    assert d.downloaded_bytes == 4096
    assert d.read_range(100, 16) == data.tobytes()[100:116]
    assert len(p.get_by_name("s")) == 1
