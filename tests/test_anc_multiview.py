"""SDI ancillary (video-anc) and multiview tests, including bit-parity
against the REAL libgstvideo VBI encoder/parser via ctypes."""

import ctypes

import numpy as np
import pytest

from gstreamer_tpu.core.caps import Caps
from gstreamer_tpu.video import anc as A
from gstreamer_tpu.video import multiview as MV
from tests.gst_ref import _load


# -- pure self-tests -----------------------------------------------------------

@pytest.mark.parametrize("fmt,width", [
    ("v210", 720), ("v210", 1920), ("UYVY", 720), ("UYVY", 1920)])
@pytest.mark.parametrize("composite", [False, True])
def test_vbi_roundtrip(fmt, width, composite):
    enc = A.VideoVBIEncoder(fmt, width)
    p1 = bytes(range(10))
    p2 = b"\x61\x00\x55" * 5
    assert enc.add_ancillary(composite, 0x61, 0x01, p1)
    assert enc.add_ancillary(composite, 0x41, 0x05, p2)
    line = enc.write_line()
    par = A.VideoVBIParser(fmt, width)
    par.add_line(line)
    ancs = par.get_ancillaries()
    assert len(ancs) == 2
    assert (ancs[0].DID, ancs[0].SDID_block_number, ancs[0].data) == \
        (0x61, 0x01, p1)
    assert ancs[1].did16 == A.AncillaryDID16.S2016_3_AFD_BAR
    assert ancs[1].data == p2


def test_vbi_checksum_reject():
    enc = A.VideoVBIEncoder("UYVY", 720)
    enc.add_ancillary(False, 0x61, 0x02, b"\x80\x80")
    line = bytearray(enc.write_line())
    # corrupt one payload byte -> checksum mismatch -> packet dropped
    line[8] ^= 0x01
    par = A.VideoVBIParser("UYVY", 720)
    par.add_line(bytes(line))
    assert par.get_ancillary() is None


def test_vbi_line_full():
    enc = A.VideoVBIEncoder("UYVY", 64)    # 128-word line
    assert enc.add_ancillary(False, 0x61, 0x01, b"x" * 100)
    assert not enc.add_ancillary(False, 0x61, 0x01, b"x" * 100)


def test_caption_type_caps():
    for t in (A.VideoCaptionType.CEA608_RAW, A.VideoCaptionType.CEA708_CDP):
        assert A.caption_type_from_caps(A.caption_type_to_caps(t)) == t
    assert A.caption_type_from_caps(
        Caps.from_string("video/x-raw, format=I420")) == \
        A.VideoCaptionType.UNKNOWN


# -- oracle parity vs libgstvideo ----------------------------------------------

class _GstAnc(ctypes.Structure):
    _fields_ = [("DID", ctypes.c_uint8),
                ("SDID_block_number", ctypes.c_uint8),
                ("data_count", ctypes.c_uint8),
                ("data", ctypes.c_uint8 * 256),
                ("_reserved", ctypes.c_void_p * 4)]


def _vbi_libs():
    libs = _load()
    if libs is None:
        pytest.skip("libgstvideo not available")
    v = libs["video"]
    v.gst_video_format_from_string.restype = ctypes.c_int
    v.gst_video_format_from_string.argtypes = [ctypes.c_char_p]
    v.gst_video_vbi_encoder_new.restype = ctypes.c_void_p
    v.gst_video_vbi_encoder_new.argtypes = [ctypes.c_int, ctypes.c_uint32]
    v.gst_video_vbi_encoder_add_ancillary.restype = ctypes.c_bool
    v.gst_video_vbi_encoder_add_ancillary.argtypes = [
        ctypes.c_void_p, ctypes.c_bool, ctypes.c_uint8, ctypes.c_uint8,
        ctypes.c_char_p, ctypes.c_uint]
    v.gst_video_vbi_encoder_write_line.argtypes = [ctypes.c_void_p,
                                                   ctypes.c_void_p]
    v.gst_video_vbi_parser_new.restype = ctypes.c_void_p
    v.gst_video_vbi_parser_new.argtypes = [ctypes.c_int, ctypes.c_uint32]
    v.gst_video_vbi_parser_add_line.argtypes = [ctypes.c_void_p,
                                                ctypes.c_void_p]
    v.gst_video_vbi_parser_get_ancillary.restype = ctypes.c_int
    v.gst_video_vbi_parser_get_ancillary.argtypes = [ctypes.c_void_p,
                                                     ctypes.c_void_p]
    return v


def _line_bytes(fmt, width):
    return (width // 6) * 16 if fmt == "v210" else 2 * width


@pytest.mark.parametrize("fmt,width", [
    ("v210", 720), ("v210", 1920), ("UYVY", 720), ("UYVY", 1920)])
def test_vbi_encoder_parity(fmt, width):
    """Our encoder's line bytes == the reference encoder's, bit for bit."""
    v = _vbi_libs()
    gfmt = v.gst_video_format_from_string(fmt.encode())
    assert gfmt > 0
    packets = [(False, 0x61, 0x01, bytes(range(20))),
               (True, 0x41, 0x05, b"\x00\xff\x7f\x80")]

    ref_enc = v.gst_video_vbi_encoder_new(gfmt, width)
    mine = A.VideoVBIEncoder(fmt, width)
    for comp, did, sdid, data in packets:
        assert v.gst_video_vbi_encoder_add_ancillary(
            ref_enc, comp, did, sdid, data, len(data))
        assert mine.add_ancillary(comp, did, sdid, data)
    buf = (ctypes.c_uint8 * _line_bytes(fmt, width))()
    v.gst_video_vbi_encoder_write_line(ref_enc, buf)
    ref_line = bytes(buf)
    my_line = mine.write_line()
    assert my_line == ref_line


@pytest.mark.parametrize("fmt,width", [("v210", 1920), ("UYVY", 720)])
def test_vbi_parser_parity(fmt, width):
    """Both parsers recover identical packets from the same noisy line."""
    v = _vbi_libs()
    gfmt = v.gst_video_format_from_string(fmt.encode())
    enc = A.VideoVBIEncoder(fmt, width)
    rng = np.random.default_rng(5)
    packets = []
    for _ in range(3):
        data = bytes(rng.integers(0, 256, int(rng.integers(1, 40)),
                                  dtype=np.uint8))
        did, sdid = int(rng.integers(1, 256)), int(rng.integers(0, 256))
        assert enc.add_ancillary(False, did, sdid, data)
        packets.append((did, sdid, data))
    line = enc.write_line()

    ref_par = v.gst_video_vbi_parser_new(gfmt, width)
    v.gst_video_vbi_parser_add_line(ref_par, line)
    ref_pkts = []
    a = _GstAnc()
    while v.gst_video_vbi_parser_get_ancillary(ref_par, ctypes.byref(a)) == 1:
        ref_pkts.append((a.DID, a.SDID_block_number,
                         bytes(a.data[:a.data_count])))
    mine = A.VideoVBIParser(fmt, width)
    mine.add_line(line)
    my_pkts = [(x.DID, x.SDID_block_number, x.data)
               for x in mine.get_ancillaries()]
    assert my_pkts == ref_pkts == packets


# -- multiview ------------------------------------------------------------------

def test_multiview_caps_strings():
    for s, m in [("mono", MV.MultiviewMode.MONO),
                 ("side-by-side", MV.MultiviewMode.SIDE_BY_SIDE),
                 ("frame-by-frame", MV.MultiviewMode.FRAME_BY_FRAME)]:
        assert MV.mode_from_caps_string(s) == m
        assert MV.mode_to_caps_string(m) == s
    assert MV.mode_from_caps_string("bogus") == MV.MultiviewMode.NONE


def test_multiview_guess_half_aspect():
    # 1080p top-bottom: wider than tall -> half aspect
    assert MV.guess_half_aspect(MV.MultiviewMode.TOP_BOTTOM,
                                1920, 1080, 1, 1)
    # side-by-side at DAR 16:9 < 2.39 -> half aspect
    assert MV.guess_half_aspect(MV.MultiviewMode.SIDE_BY_SIDE,
                                1920, 1080, 1, 1)
    # side-by-side of an ultrawide (DAR 32:9 >= 2.39) -> full views
    assert not MV.guess_half_aspect(MV.MultiviewMode.SIDE_BY_SIDE,
                                    3840, 1080, 1, 1)
    assert not MV.guess_half_aspect(MV.MultiviewMode.MONO, 1920, 1080, 1, 1)


def test_multiview_change_mode_geometry():
    # side-by-side half-aspect 1920x1080 -> separated: per-view 960x1080,
    # PAR doubles horizontally to keep display aspect
    w, h, par = MV.change_mode_geometry(
        1920, 1080, (1, 1),
        MV.MultiviewMode.SIDE_BY_SIDE, MV.MultiviewFlags.HALF_ASPECT,
        MV.MultiviewMode.SEPARATED, MV.MultiviewFlags.NONE)
    assert (w, h, par) == (960, 1080, (2, 1))
    # and back
    w, h, par = MV.change_mode_geometry(
        960, 1080, (2, 1),
        MV.MultiviewMode.SEPARATED, MV.MultiviewFlags.NONE,
        MV.MultiviewMode.SIDE_BY_SIDE, MV.MultiviewFlags.HALF_ASPECT)
    assert (w, h, par) == (1920, 1080, (1, 1))
    # top-bottom full-aspect -> mono-style separated halves height only
    w, h, par = MV.change_mode_geometry(
        1920, 2160, (1, 1),
        MV.MultiviewMode.TOP_BOTTOM, MV.MultiviewFlags.NONE,
        MV.MultiviewMode.SEPARATED, MV.MultiviewFlags.NONE)
    assert (w, h, par) == (1920, 1080, (1, 1))
