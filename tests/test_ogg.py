"""Ogg container (FLAC mapping): page layer + roundtrips."""

import struct

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.ogg import ogg_crc, ogg_page, parse_ogg_pages


class TestPageLayer:
    def test_page_roundtrip(self):
        pkts = [b"hello", b"x" * 300, b"", b"tail"]
        page = ogg_page(pkts, serial=42, seq=7, granulepos=1234)
        assert page[:4] == b"OggS"
        parsed = parse_ogg_pages(page)
        assert len(parsed) == 1
        serial, granule, got = parsed[0]
        assert (serial, granule) == (42, 1234)
        assert got == pkts

    def test_crc_detects_corruption(self):
        page = bytearray(ogg_page([b"data"], 1, 0, 0))
        page[-1] ^= 0xFF
        with pytest.raises(ValueError):
            parse_ogg_pages(bytes(page))

    def test_255_boundary_packet(self):
        # a 255-byte packet needs a 0 lacing terminator
        pkts = [b"a" * 255]
        parsed = parse_ogg_pages(ogg_page(pkts, 1, 0, 0))
        assert parsed[0][2] == pkts

    def test_bos_eos_flags(self):
        bos = ogg_page([b"x"], 1, 0, 0, bos=True)
        eos = ogg_page([b"y"], 1, 1, 10, eos=True)
        assert bos[5] == 0x02 and eos[5] == 0x04


class TestOggFlac:
    def test_roundtrip_bit_exact(self, tmp_path):
        path = tmp_path / "a.ogg"
        p = parse_launch(
            f"audiotestsrc num-buffers=6 samplesperbuffer=1500 "
            f"wave=square ! audio/x-raw,format=S16LE,rate=22050,"
            f"channels=2 ! oggmux location={path}")
        p.run()
        p.set_state("null")
        blob = open(path, "rb").read()
        assert blob[:4] == b"OggS"
        assert b"\x7fFLAC" in blob[:64]

        d = parse_launch(f"oggdemux location={path} ! appsink name=out")
        d.run()
        outs = []
        while (s := d.get_by_name("out").pull_sample()) is not None:
            outs.append(np.asarray(s.buffer.data))
        got = np.concatenate(outs)

        g = parse_launch(
            "audiotestsrc num-buffers=6 samplesperbuffer=1500 "
            "wave=square ! audio/x-raw,format=S16LE,rate=22050,"
            "channels=2 ! appsink name=out")
        g.run()
        wants = []
        while (s := g.get_by_name("out").pull_sample()) is not None:
            wants.append(np.asarray(s.buffer.data))
        np.testing.assert_array_equal(got, np.concatenate(wants))

    def test_granulepos_monotonic(self, tmp_path):
        path = tmp_path / "g.ogg"
        p = parse_launch(
            f"audiotestsrc num-buffers=5 samplesperbuffer=1000 ! "
            f"audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            f"oggmux location={path} blocksize=1024")
        p.run()
        p.set_state("null")
        pages = parse_ogg_pages(open(path, "rb").read())
        granules = [g for _, g, _ in pages[1:]]
        assert granules == sorted(granules)
        assert granules[-1] == 5000
