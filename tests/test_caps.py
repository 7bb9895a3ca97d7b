"""Caps/value negotiation tests.

Modeled on the reference core suites
(subprojects/gstreamer/tests/check/gst/gstcaps.c, gstvalue.c,
gststructure.c).
"""

from gstreamer_tpu.core.caps import Caps
from gstreamer_tpu.core.structure import Structure, parse_structure
from gstreamer_tpu.core.value import (
    Fraction,
    FractionRange,
    IntRange,
    ValueList,
    fixate,
    fixate_nearest_int,
    intersect,
    is_fixed,
)


class TestValues:
    def test_fraction(self):
        assert Fraction(30, 1) == Fraction(60, 2)
        assert Fraction(1, 2) < Fraction(2, 3)
        assert float(Fraction(30000, 1001)) > 29.9
        assert Fraction.parse("30/1") == Fraction(30)

    def test_int_range_intersect(self):
        assert intersect(IntRange(1, 100), IntRange(50, 200)) == IntRange(50, 100)
        assert intersect(IntRange(1, 10), IntRange(20, 30)) is None
        assert intersect(IntRange(1, 100), 42) == 42
        assert intersect(IntRange(1, 100), 200) is None
        # collapse to scalar
        assert intersect(IntRange(5, 10), IntRange(10, 20)) == 10

    def test_int_range_step(self):
        r = intersect(IntRange(0, 100, 4), IntRange(0, 100, 6))
        assert r == IntRange(0, 96, 12)

    def test_list_intersect(self):
        l = ValueList(["I420", "NV12", "RGB"])
        assert intersect(l, "NV12") == "NV12"
        assert intersect(l, ValueList(["RGB", "I420"])) == ValueList(["I420", "RGB"])
        assert intersect(l, "YUY2") is None

    def test_fraction_range(self):
        fr = FractionRange(Fraction(0), Fraction(2147483647))
        assert intersect(fr, Fraction(30)) == Fraction(30)

    def test_fixate(self):
        assert fixate(IntRange(240, 360)) == 240
        assert fixate(ValueList([5, 6])) == 5
        assert is_fixed(fixate(FractionRange(Fraction(1), Fraction(100))))

    def test_fixate_nearest_int(self):
        assert fixate_nearest_int(IntRange(16, 4096), 224) == 224
        assert fixate_nearest_int(IntRange(16, 100), 224) == 100
        assert fixate_nearest_int(ValueList([100, 224, 300]), 230) == 224


class TestStructure:
    def test_parse(self):
        s = parse_structure(
            "video/x-raw, format=I420, width=1920, height=1080, framerate=30/1"
        )
        assert s.name == "video/x-raw"
        assert s["format"] == "I420"
        assert s["width"] == 1920
        assert s["framerate"] == Fraction(30)

    def test_parse_ranges(self):
        s = parse_structure(
            "video/x-raw, width=[16,4096], framerate=[0/1,2147483647/1], "
            "format={I420, NV12}"
        )
        assert s["width"] == IntRange(16, 4096)
        assert isinstance(s["format"], ValueList)

    def test_intersect_missing_fields(self):
        a = parse_structure("video/x-raw, width=320")
        b = parse_structure("video/x-raw, height=240")
        r = a.intersect(b)
        assert r["width"] == 320 and r["height"] == 240

    def test_subset(self):
        a = parse_structure("video/x-raw, format=I420, width=320, height=240")
        b = parse_structure("video/x-raw, width=[16,4096], height=[16,4096]")
        assert a.is_subset(b)
        assert not b.is_subset(a)


class TestCaps:
    def test_parse_multi(self):
        c = Caps.from_string(
            "video/x-raw, format=I420; video/x-raw(memory:TPUHBM), format=NV12"
        )
        assert len(c) == 2

    def test_any_empty(self):
        assert Caps.any().is_any
        assert Caps.empty().is_empty
        assert Caps.any().intersect(Caps("video/x-raw")).structures

    def test_intersect(self):
        a = Caps.from_string("video/x-raw, format={I420, RGB}, width=[16,4096]")
        b = Caps.from_string("video/x-raw, format=RGB, width=224")
        r = a.intersect(b)
        assert r.is_fixed()
        assert r[0]["format"] == "RGB"
        assert r[0]["width"] == 224

    def test_no_intersect_across_names(self):
        a = Caps.from_string("video/x-raw, format=I420")
        b = Caps.from_string("audio/x-raw, rate=48000")
        assert a.intersect(b).is_empty

    def test_fixate(self):
        c = Caps.from_string(
            "video/x-raw, format={I420, RGB}, width=[16,4096], height=[16,4096]"
        )
        f = c.fixate()
        assert f.is_fixed()
        assert f[0]["format"] == "I420"
        assert f[0]["width"] == 16

    def test_template_negotiation_roundtrip(self):
        # mirrors the videoconvert "every format pair intersects templates"
        # pattern (tests/check/elements/videoconvert.c:88)
        tmpl = Caps.from_string(
            "video/x-raw, format={I420, NV12, RGB, BGR, RGBA, YUY2}, "
            "width=[1,32767], height=[1,32767]"
        )
        for fmt in ("I420", "NV12", "RGB", "YUY2"):
            fixed = Caps.from_string(
                f"video/x-raw, format={fmt}, width=1920, height=1080"
            )
            assert fixed.can_intersect(tmpl)
            assert fixed.is_subset(tmpl)
